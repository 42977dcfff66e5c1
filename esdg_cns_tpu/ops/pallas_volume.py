"""Fully fused ES-DG volume kernel for collocated hex elements.

One Pallas kernel per element block computes, entirely in VMEM:

  1. entropy variables V = v(U) at the (collocated) volume nodes,
  2. face extrapolation Vf = Ef V (MXU) and the inverse map U(Vf),
  3. flux variables (rho, u, beta) + logs at all hybridized points,
  4. the line-sparse flux differencing (pallas line kernel logic),
  5. the projection Ph QF, split into its collocated structure
     QF_vol / wq + LIFT @ QF_face (1/wq folded into the host-built
     coefficient tensors, LIFT applied on the MXU),

and emits the partial volume RHS plus the face traces
(qm, uf, log rho, log beta) needed by the surface/neighbor stage.
This removes the HBM round-trips between the projection, flux
differencing and Ph stages of the unfused path (SURVEY.md 2.5 items
1-3 in a single kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.euler import ec_flux_fields
from .tensor_product_fd import LineOps, _hex_line_coeffs


def dot_highest(a, x):
    """HIGHEST-precision kernel matmul (single source for every Pallas
    kernel: the default one-pass bf16 MXU matmul breaks the SBP/entropy
    identities — CLAUDE.md precision rule; works inside Mosaic)."""
    return jnp.dot(a, x, preferred_element_type=x.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _entropy_project_hex(q, ef, gamma):
    """Collocated-hex entropy projection, pure jnp on VMEM values
    (shared by the joint and split volume kernels): conservative
    volume state q [5, Nq, KB] -> hybridized flux variables
    qh = (rho, u1..3, beta) and logs (log rho, log beta), each
    [Nh, KB] = volume rows stacked over extrapolated-face rows.

      v(U) at volume nodes -> Vf = Ef V (MXU) -> U(Vf) -> flux vars.
    """
    gm1 = gamma - 1.0
    rho, m1, m2, m3, e = (q[i] for i in range(5))
    rhou2 = m1 * m1 + m2 * m2 + m3 * m3
    p = gm1 * (e - 0.5 * rhou2 / rho)
    s = jnp.log(p) - gamma * jnp.log(rho)
    v1 = (gamma + 1.0 - s) - gm1 * e / p
    vm = [gm1 * m / p for m in (m1, m2, m3)]
    ve = -gm1 * rho / p

    def face(x):
        return dot_highest(ef, x)

    fv1, fve = face(v1), face(ve)
    fvm = [face(v) for v in vm]
    vnorm = fvm[0] * fvm[0] + fvm[1] * fvm[1] + fvm[2] * fvm[2]
    sf = gamma - fv1 + vnorm / (2.0 * fve)
    rhoe = (gm1 / (-fve) ** gamma) ** (1.0 / gm1) * jnp.exp(-sf / gm1)
    frho = rhoe * (-fve)
    fmom = [rhoe * v for v in fvm]
    fe = rhoe * (1.0 - vnorm / (2.0 * fve))

    beta_v = rho / (2.0 * p)
    uvel = [m / rho for m in (m1, m2, m3)]
    fp = gm1 * (fe - 0.5 * (fmom[0] * fmom[0] + fmom[1] * fmom[1]
                            + fmom[2] * fmom[2]) / frho)
    beta_f = frho / (2.0 * fp)
    fuvel = [m / frho for m in fmom]

    def hyb(vol_x, face_x):
        return jnp.concatenate([vol_x, face_x], axis=0)

    qh = [hyb(rho, frho)] + [hyb(uvel[d], fuvel[d]) for d in range(3)] \
        + [hyb(beta_v, beta_f)]
    return qh, [jnp.log(qh[0]), jnp.log(qh[4])]


def _volume_kernel(q_ref, geo_ref, cvol_ref, cface_ref, iw_ref, iwf_ref,
                   ef_ref, lift_ref, out_ref, traces_ref, *, n1, gamma,
                   curved, view_acc=False, diag=False, pad_x=False,
                   packed=False):
    nq = n1 ** 3
    nfp = n1 * n1
    nf = q_ref.shape[0]
    kb = q_ref.shape[2]
    gm1 = gamma - 1.0

    q = q_ref[...]                    # [5, Nq, KB] conservative
    geo = geo_ref[...]
    cvol = cvol_ref[...]
    cface = cface_ref[...]
    iw = iw_ref[...]                  # [Nq, 128] replicated 1/wq
    iwf = iwf_ref[...]                # [nfp, 128] replicated 1/wface
    ef = ef_ref[...]                  # [Nfq, Nq]
    lift = lift_ref[...]              # [Nq, Nfq]

    # ---- entropy projection -> hybridized flux variables + logs ----
    qh, qlog = _entropy_project_hex(q, ef, gamma)

    # ---- traces for the surface stage: (rho, u, beta) + logs only;
    # the conservative face values the LF term needs are re-derived
    # pointwise on both sides in the surface kernel, so they are never
    # written to HBM or exchanged ----
    for i in range(5):
        traces_ref[i] = qh[i][nq:, :]
    traces_ref[5] = qlog[0][nq:, :]
    traces_ref[6] = qlog[1][nq:, :]

    # ---- line-sparse flux differencing ----
    if pad_x:
        # sublane-padded fd body (affine only): all three directions
        # on ONE x-padded rank-4 view set, shared with the split path.
        # packed=True swaps in the packed-fold body (_fd_packed,
        # round 5): per-direction (pair_axis, fold->tile, kb) layouts,
        # measured 1.38x over pad8 at n1=5 in isolation
        body = _fd_packed if packed else _fd_pad8
        acc_vol, fr8 = body(
            lambda f: qh[f], lambda l: qlog[l], geo, cvol, cface,
            n1=n1, nf=nf, kb=kb, gamma=gamma, dirs=(0, 1, 2), diag=diag,
            dtype=q.dtype,
        )
        face_rows = [fr8[fid] for fid in range(6)]

    shapes = {0: (nfp, n1), 1: (n1, n1, n1), 2: (n1, nfp)}
    axes = {0: 1, 1: 1, 2: 0}
    if not pad_x:
        acc_vol = [jnp.zeros((nq, kb), q.dtype) for _ in range(nf)]
        face_rows = [[None] * nf for _ in range(6)]

    vol = [x[:nq] for x in qh]
    vlog = [l[:nq] for l in qlog]
    for d in range(3) if not pad_x else ():
        shape, axis = shapes[d], axes[d]
        vshape = (*shape, kb)
        vol_d = [v.reshape(vshape) for v in vol]
        log_d = [l.reshape(vshape) for l in vlog]
        # diag (axis-aligned affine mesh): geo[d*3+x] == 0 for x != d, so
        # only direction d's flux assembly and ONE metric multiply are
        # needed per pair (the zero terms are runtime arrays Mosaic
        # cannot eliminate — dropping them statically saves ~1/3 of the
        # per-pair VPU ops, measured in PARITY.md round 3)
        flux_dirs = (d,) if diag else None
        if curved:
            geo_d = [geo[d * 3 + x, :nq].reshape(vshape) for x in range(3)]
        elif diag:
            geo_d = [geo[d * 3 + d, 0].reshape((1,) * len(shape) + (kb,))]
        else:
            geo_d = [geo[d * 3 + x, 0].reshape((1,) * len(shape) + (kb,))
                     for x in range(3)]

        def contract(fluxes, gavg=None):
            # gavg: pre-averaged (and row-sliced) metric terms for the
            # curved path; None -> the element's affine/volume metrics
            if diag:
                return [geo_d[0] * fluxes[0][f] for f in range(nf)]
            out = []
            for f in range(nf):
                t = None
                for x in range(3):
                    g = geo_d[x] if gavg is None else gavg[x]
                    term = g * fluxes[x][f]
                    t = term if t is None else t + term
                out.append(t)
            return out

        def line_slice(arr, j):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(j, j + 1)
            return arr[tuple(sl)]

        def axis_slice(arr, hi):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(0, hi)
            return arr[tuple(sl)]

        # view_acc: accumulate this direction's contributions in its own
        # line view and reshape to flat ONCE (per field) at the end —
        # the per-pair view->flat reshape is a cross-tile sublane
        # relayout whenever n1 does not divide the 8-sublane tile
        acc_d = ([jnp.zeros(vshape, q.dtype) for _ in range(nf)]
                 if view_acc else None)
        tofl = (lambda a: a) if view_acc else (lambda a: a.reshape(nq, kb))

        def add_acc(f, w):
            if view_acc:
                acc_d[f] = acc_d[f] + w
            else:
                acc_vol[f] = acc_vol[f] + tofl(w)

        # triangular vol-vol line pairs: S1 is skew with zero diagonal,
        # so each plane pair (i < ap) is evaluated once and the plane-ap
        # row is the negated line sum (the reference's halving trick,
        # dg2D_CNS_modalESDG.jl:250-254) — 37.5% of the naive pair work
        # at n1 = 4
        for ap in range(1, n1):
            qi = tuple(axis_slice(v, ap) for v in vol_d)
            li = tuple(axis_slice(l, ap) for l in log_d)
            qj = tuple(line_slice(v, ap) for v in vol_d)
            lj = tuple(line_slice(l, ap) for l in log_d)
            fluxes = ec_flux_fields(qi, qj, li, lj, gamma, dirs=flux_dirs)
            gj = ([0.5 * (axis_slice(g, ap) + line_slice(g, ap))
                   for g in geo_d] if curved else None)
            fr = contract(fluxes, gj)
            c = axis_slice(cvol[d * n1 + ap, :, 0:1].reshape(*shape, 1), ap)
            zshape = list(shape) + [kb]
            zshape[axis] = n1 - ap - 1
            for f in range(nf):
                w = c * fr[f]
                parts = [w, -jnp.sum(w, axis=axis, keepdims=True)]
                if n1 - ap - 1:
                    parts.append(jnp.zeros(zshape, w.dtype))
                add_acc(f, jnp.concatenate(parts, axis=axis))

        for side in range(2):
            fid = 2 * d + side
            rows = slice(nq + fid * nfp, nq + (fid + 1) * nfp)
            fshape = list(shape)
            fshape[axis] = 1
            fvals = tuple(qh[f][rows].reshape(*fshape, kb) for f in range(nf))
            flog = tuple(qlog[l][rows].reshape(*fshape, kb) for l in range(2))
            fluxes = ec_flux_fields(tuple(vol_d), fvals, tuple(log_d), flog,
                                    gamma, dirs=flux_dirs)
            gj = ([0.5 * (geo_d[x] + geo[d * 3 + x, rows].reshape(*fshape, kb))
                   for x in range(3)] if curved else None)
            fr = contract(fluxes, gj)
            c = cface[fid, :, 0:1].reshape(*shape, 1)
            for f in range(nf):
                w = c * fr[f]
                add_acc(f, w)
                face_rows[fid][f] = -jnp.sum(w, axis=axis).reshape(nfp, kb)

        if view_acc:
            for f in range(nf):
                acc_vol[f] = acc_vol[f] + acc_d[f].reshape(nq, kb)

    # ---- Ph QF = QF_vol / wq + LIFT @ (QF_face / wf) ----
    # (Ph's face block is diag(1/wq) Vf' = LIFT diag(1/wf))
    iw_col = iw[:, 0:1]
    iwf_col = iwf[:, 0:1]
    for f in range(nf):
        qf_face = jnp.concatenate(
            [iwf_col * face_rows[fid][f] for fid in range(6)], axis=0
        )                                                      # [Nfq, KB]
        out_ref[f] = 2.0 * iw_col * acc_vol[f] + 2.0 * jnp.dot(
            lift, qf_face, preferred_element_type=q.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )


# Scoped-VMEM budget for the fused kernels.  The default XLA limit is
# 16 MB; v5e has 128 MB of VMEM, and the N>=4 volume kernel's unrolled
# line loop needs ~50 MB of stack at block_k=64.  Leaving headroom for
# double-buffered block transfers, cap the kernel stack at 100 MB.
_VMEM_LIMIT = 100 * 1024 * 1024


def detect_axis_aligned(disc, tol: float = 1e-9) -> bool:
    """True when the hex discretization's metric is diagonal and every
    face-group normal has a single nonzero component (uniform/cartesian
    meshes — the reference's only hex generator, UniformHexMesh.jl).

    Host-side (eager numpy) — call at RHS-builder time, never under
    jit.  tol matches the setup-time snap gate
    (core.discretization._snap, 1e-9 relative; the curl-form noise is
    absolute, so its RELATIVE size grows with k1d — 1e-11 failed at
    the k1d=32 bench mesh, round 5): any off-axis entry the
    snap left alone fails detection, so a detected-aligned mesh is
    guaranteed to carry EXACT zeros in the entries the diag kernels
    statically drop (and that the compact one-row normal folds
    together) — the specialization is then bit-consistent with the
    general contraction, never an approximation.

    Under a trace (shard_map/jit builds the RHS from tracer disc
    leaves) this returns False — callers that shard a concrete global
    disc first should detect eagerly and pass ``axis_aligned``
    explicitly (parallel/sharding.py does).
    """
    if disc.elem_type != "hex" or disc.line_ops is None:
        return False
    if isinstance(disc.geo, jax.core.Tracer):
        return False
    geo = np.asarray(disc.geo)
    if geo.shape[1] != 1:        # curved
        return False
    scale = np.abs(geo).max()
    for d in range(3):
        for x in range(3):
            if x != d and np.abs(geo[d * 3 + x]).max() > tol * scale:
                return False
    nxj = np.stack([np.asarray(a) for a in disc.nxj])
    nfp = nxj.shape[1] // 6
    nscale = np.abs(nxj).max()
    for fid in range(6):
        d = fid // 2
        rows = slice(fid * nfp, (fid + 1) * nfp)
        for x in range(3):
            if x != d and np.abs(nxj[x, rows]).max() > tol * nscale:
                return False
    return True


def default_block_k(n: int, volume_mode: str = "joint") -> int:
    """Element-block width for the fused Euler kernels (measured on the
    v5e, examples/r3_variant_study.py).  The deciding property is
    whether the line extent n1 = N+1 divides the 8-sublane tile: when
    it does (N=1, 3, 7), every vector op is tile-aligned and 128 lanes
    is fastest (wider blocks only add VMEM traffic — N=3 3.75e9 at 128
    vs 2.6e9 at 512); when it does not, the per-op misalignment
    overhead dominates and WIDE lane blocks amortize it — N=4 split at
    512 runs 2.25x faster than at 128, and N=2 (n1=3) at 1024 runs
    2.1x faster (1.01e9 -> 2.12e9 full RHS, K=32768; 512 -> 1.90e9,
    2048 -> 1.93e9).  The round-4 pad8 kernels keep the same widths:
    with the x axis sublane-padded the blocks are tile-aligned but
    carry n1p/n1 padded rows, and wide lanes still win (N=2 joint_pad8
    1024 = 2.43e9 vs 512 = 2.37e9; N=4 joint_pad8 512 = 2.84e9).

    The round-5 packed-fold kernels (joint_packed) fold n1^2 rows into
    the sublane dim, so alignment no longer tracks n1 | 8 and
    mid-width blocks win: N=3 packed 256 = 3.98e9 vs 512 = 3.82e9 vs
    128 = 3.20e9 (full RHS, K=13824)."""
    n1 = n + 1
    if volume_mode == "joint_packed":
        return 256
    if 8 % n1 == 0:
        return 128
    return 1024 if n1 == 3 else 512


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "nq", "line_ops", "block_k", "interpret",
                     "view_acc", "diag", "pad_x", "packed"),
)
def euler_volume_pallas(q, geo, ef, lift, gamma, *, nq,
                        line_ops: LineOps, block_k: int = 128,
                        interpret: bool = False, view_acc: bool = False,
                        diag: bool = False, pad_x: bool = False,
                        packed: bool = False):
    """Fused volume stage. Returns (ph_qf [5, Nq, K], traces [7, Nfq, K])
    with traces = (rho, u1, u2, u3, beta, log rho, log beta) at the face
    points."""
    nf, nq_, k = q.shape
    n1 = line_ops.n1d
    nfq = 6 * n1 * n1
    curved = geo.shape[1] != 1

    kb = min(block_k, k)
    pad = (-k) % kb
    if pad:
        # quiescent padded lanes (rho=1, mom=0, E=1): all-ones state has
        # negative pressure and would fill the padded lanes with NaN
        # from log/pow — same invariant as the split path (below) and
        # the modal kernel (keeps jax_debug_nans and any future
        # cross-lane op safe; padded outputs are sliced away)
        quiescent = jnp.zeros((nf,), q.dtype).at[0].set(1.0).at[-1].set(1.0)
        q = jnp.concatenate(
            [q, jnp.broadcast_to(quiescent[:, None, None], (nf, nq_, pad))],
            axis=-1,
        )
        geo = jnp.pad(geo, ((0, 0), (0, 0), (0, pad)))
    kp = k + pad
    ng = geo.shape[1]

    cvol_np, cface_np = _hex_line_coeffs(line_ops)
    cvol = jnp.asarray(cvol_np, q.dtype)
    cface = jnp.asarray(cface_np, q.dtype)
    # 1/wq from the 1D weights (wq = w x w x w), applied to the volume
    # rows only (the face rows feed the LIFT matmul unscaled)
    w1 = np.asarray(line_ops.w1)
    idx = np.arange(nq)
    wq_np = w1[idx % n1] * w1[(idx // n1) % n1] * w1[idx // (n1 * n1)]
    iw = jnp.asarray(np.repeat((1.0 / wq_np)[:, None], 128, axis=1), q.dtype)
    fidx = np.arange(n1 * n1)
    wf_np = w1[fidx % n1] * w1[fidx // n1]
    iwf = jnp.asarray(np.repeat((1.0 / wf_np)[:, None], 128, axis=1), q.dtype)

    if pad_x and curved:
        raise ValueError("pad_x requires an affine mesh")
    kernel = functools.partial(_volume_kernel, n1=n1, gamma=gamma,
                               curved=curved, view_acc=view_acc,
                               diag=diag and not curved, pad_x=pad_x,
                               packed=packed)
    out, traces = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=[
            pl.BlockSpec((nf, nq, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((geo.shape[0], ng, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n1, nq, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, nq, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n1 * n1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfq, nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, nfq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nf, nq, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, nfq, kb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nf, nq, kp), q.dtype),
            jax.ShapeDtypeStruct((7, nfq, kp), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, geo, cvol, cface, iw, iwf, ef, lift)
    return out[:, :, :k], traces[:, :, :k]


def _proj_kernel(q_ref, ef_ref, qh_ref, qlog_ref, traces_ref, *, gamma):
    """Split-path stage 1: entropy projection + flux variables + logs.

    Emits the hybridized flux-variable state (qh, qlog) for the
    per-direction fd kernels plus the 7-row face traces for the
    exchange (same trace contract as _volume_kernel).
    """
    nf = q_ref.shape[0]
    nq = q_ref.shape[1]
    q = q_ref[...]
    ef = ef_ref[...]

    qh, qlog = _entropy_project_hex(q, ef, gamma)
    for i in range(5):
        qh_ref[i] = qh[i]
        traces_ref[i] = qh[i][nq:, :]
    qlog_ref[0] = qlog[0]
    qlog_ref[1] = qlog[1]
    traces_ref[5] = qlog[0][nq:, :]
    traces_ref[6] = qlog[1][nq:, :]


def _fd_dir_kernel(qh_ref, qlog_ref, geo_ref, cvol_ref, cface_ref, out_ref,
                   *, n1, gamma, d, view_acc=False, diag=False):
    """Split-path stage 2: ONE direction's triangular line-sparse flux
    differencing.  out rows: [0:nq) volume contribution, [nq:nq+nfp)
    minus-face rows, [nq+nfp:nq+2nfp) plus-face rows.

    Rationale (measured, N=4 K=13824): the same direction-2 work costs
    2.2 ms standalone vs 3.7 ms embedded in the all-in-one kernel —
    kernel-wide register/scheduling pressure taxes each direction, and
    the cost is additive across directions, so splitting recovers it.

    view_acc: keep the accumulator in the direction's (…, n1, …, KB)
    line view and reshape to flat (Nq, KB) ONCE at the end, instead of
    per pair iteration.  At n1 = 5 every view<->flat reshape is a
    cross-tile sublane relayout (5 does not divide the 8-sublane tile),
    so the flat-accumulator form pays one relayout per pair per field.
    """
    nq = n1 ** 3
    nfp = n1 * n1
    nf = qh_ref.shape[0]
    kb = qh_ref.shape[2]
    qh = qh_ref[...]
    qlog = qlog_ref[...]
    geo = geo_ref[...]
    cvol = cvol_ref[...]
    cface = cface_ref[...]

    shapes = {0: (nfp, n1), 1: (n1, n1, n1), 2: (n1, nfp)}
    axes = {0: 1, 1: 1, 2: 0}
    shape, axis = shapes[d], axes[d]
    vshape = (*shape, kb)
    vol_d = [qh[f, :nq].reshape(vshape) for f in range(nf)]
    log_d = [qlog[l, :nq].reshape(vshape) for l in range(2)]
    # diag: axis-aligned metric — only direction d's flux and one
    # multiply per pair (see _volume_kernel)
    flux_dirs = (d,) if diag else None
    if diag:
        geo_d = [geo[d * 3 + d, 0].reshape((1,) * len(shape) + (kb,))]
    else:
        geo_d = [geo[d * 3 + x, 0].reshape((1,) * len(shape) + (kb,))
                 for x in range(3)]

    def contract(fluxes):
        if diag:
            return [geo_d[0] * fluxes[0][f] for f in range(nf)]
        out = []
        for f in range(nf):
            t = None
            for x in range(3):
                term = geo_d[x] * fluxes[x][f]
                t = term if t is None else t + term
            out.append(t)
        return out

    def line_slice(arr, j):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(j, j + 1)
        return arr[tuple(sl)]

    def axis_slice(arr, hi):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, hi)
        return arr[tuple(sl)]

    vshape = (*shape, kb)
    acc_shape = vshape if view_acc else (nq, kb)
    tofl = (lambda a: a) if view_acc else (lambda a: a.reshape(nq, kb))
    acc_vol = [jnp.zeros(acc_shape, qh.dtype) for _ in range(nf)]
    for ap in range(1, n1):
        qi = tuple(axis_slice(v, ap) for v in vol_d)
        li = tuple(axis_slice(l, ap) for l in log_d)
        qj = tuple(line_slice(v, ap) for v in vol_d)
        lj = tuple(line_slice(l, ap) for l in log_d)
        fluxes = ec_flux_fields(qi, qj, li, lj, gamma, dirs=flux_dirs)
        fr = contract(fluxes)
        c = axis_slice(cvol[d * n1 + ap, :, 0:1].reshape(*shape, 1), ap)
        zshape = list(shape) + [kb]
        zshape[axis] = n1 - ap - 1
        for f in range(nf):
            w = c * fr[f]
            parts = [w, -jnp.sum(w, axis=axis, keepdims=True)]
            if n1 - ap - 1:
                parts.append(jnp.zeros(zshape, w.dtype))
            acc_vol[f] = acc_vol[f] + tofl(jnp.concatenate(parts, axis=axis))

    face_rows = {}
    for side in range(2):
        fid = 2 * d + side
        rows = slice(nq + fid * nfp, nq + (fid + 1) * nfp)
        fshape = list(shape)
        fshape[axis] = 1
        fvals = tuple(qh[f, rows].reshape(*fshape, kb) for f in range(nf))
        flog = tuple(qlog[l, rows].reshape(*fshape, kb) for l in range(2))
        fluxes = ec_flux_fields(tuple(vol_d), fvals, tuple(log_d), flog,
                                gamma, dirs=flux_dirs)
        fr = contract(fluxes)
        c = cface[fid, :, 0:1].reshape(*shape, 1)
        face_rows[side] = []
        for f in range(nf):
            w = c * fr[f]
            acc_vol[f] = acc_vol[f] + tofl(w)
            face_rows[side].append(-jnp.sum(w, axis=axis).reshape(nfp, kb))

    for f in range(nf):
        out_ref[f, :nq, :] = (acc_vol[f].reshape(nq, kb) if view_acc
                              else acc_vol[f])
        out_ref[f, nq:nq + nfp, :] = face_rows[0][f]
        out_ref[f, nq + nfp:, :] = face_rows[1][f]


def _fd_pad8(get_qh, get_qlog, geo, cvol, cface, *, n1, nf, kb, gamma,
             dirs, diag, dtype):
    """Shared triangular fd body with the line (x) axis SUBLANE-PADDED
    to a full 8-row tile (round-4, VERDICT item 2).

    Same flux arithmetic and pair structure as _fd_dir_kernel, but all
    values live in rank-4 (z, y, x_pad, KB) views with x padded from n1
    to the next multiple of 8.  Rationale: at n1=5 each 5-row line
    straddles 8-sublane tiles with a DIFFERENT phase per line (5 and 8
    are coprime), so every strided slice/op needs per-phase handling —
    the measured fixed per-op overhead behind the N=4 cliff.  With x
    padded to 8, every line is exactly one tile row block and every
    x-slice has one uniform mask.  Pad values are the quiescent state
    (rho=1, u=0, beta=1, logs=0) so the flux algebra stays finite;
    padded positions carry ZERO quadrature coefficients, so they
    contribute nothing (exactly the lane-padding contract of
    euler_volume_split_pallas).

    Args:
      get_qh(f) / get_qlog(l): row accessors returning (Nh, KB) values.
      dirs: directions to accumulate (the split path passes one, the
        joint kernel all three).  Affine metrics only (geo [9, 1, KB]).

    Returns (acc_flat, face_rows): acc_flat[f] is the (nq, KB) volume
    accumulation; face_rows[fid][f] the (nfp, KB) face rows for each
    fid in 2*d+side over the requested dirs.
    """
    nq = n1 ** 3
    nfp = n1 * n1
    n1p = -(-n1 // 8) * 8
    quies = {0: 1.0, nf - 1: 1.0}   # rho = beta = 1 at padded nodes

    def pad_x(a, fill):
        # a: (z, y, x=n1, kb) -> (z, y, n1p, kb)
        padshape = a.shape[:2] + (n1p - n1,) + a.shape[3:]
        return jnp.concatenate(
            [a, jnp.full(padshape, fill, a.dtype)], axis=2)

    vol_d = [pad_x(get_qh(f)[:nq].reshape(n1, n1, n1, kb),
                   quies.get(f, 0.0)) for f in range(nf)]
    log_d = [pad_x(get_qlog(l)[:nq].reshape(n1, n1, n1, kb), 0.0)
             for l in range(2)]

    def coeff_view(row):
        # row: (nq, 1) quadrature pair coefficients -> padded rank-4
        # view with ZEROS at padded x positions
        return pad_x(row.reshape(n1, n1, n1, 1), 0.0)

    acc = [jnp.zeros((n1, n1, n1p, kb), dtype) for _ in range(nf)]
    face_rows = {}
    fshapes = {0: (n1, n1, 1), 1: (n1, 1, n1), 2: (1, n1, n1)}
    for d in dirs:
        axis = {0: 2, 1: 1, 2: 0}[d]
        flux_dirs = (d,) if diag else None
        if diag:
            geo_d = [geo[d * 3 + d, 0].reshape(1, 1, 1, kb)]
        else:
            geo_d = [geo[d * 3 + x, 0].reshape(1, 1, 1, kb)
                     for x in range(3)]

        def contract(fluxes):
            if diag:
                return [geo_d[0] * fluxes[0][f] for f in range(nf)]
            out = []
            for f in range(nf):
                t = None
                for x in range(3):
                    term = geo_d[x] * fluxes[x][f]
                    t = term if t is None else t + term
                out.append(t)
            return out

        def line_slice(arr, j):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(j, j + 1)
            return arr[tuple(sl)]

        def axis_slice(arr, hi):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(0, hi)
            return arr[tuple(sl)]

        ext = n1p if axis == 2 else n1   # accumulator extent along axis
        for ap in range(1, n1):
            qi = tuple(axis_slice(v, ap) for v in vol_d)
            li = tuple(axis_slice(l, ap) for l in log_d)
            qj = tuple(line_slice(v, ap) for v in vol_d)
            lj = tuple(line_slice(l, ap) for l in log_d)
            fluxes = ec_flux_fields(qi, qj, li, lj, gamma, dirs=flux_dirs)
            fr = contract(fluxes)
            c = axis_slice(coeff_view(cvol[d * n1 + ap, :, 0:1]), ap)
            zshape = [n1, n1, n1p, kb]
            zshape[axis] = ext - ap - 1
            for f in range(nf):
                w = c * fr[f]
                parts = [w, -jnp.sum(w, axis=axis, keepdims=True)]
                if zshape[axis]:
                    parts.append(jnp.zeros(zshape, w.dtype))
                acc[f] = acc[f] + jnp.concatenate(parts, axis=axis)

        for side in range(2):
            fid = 2 * d + side
            rows = slice(nq + fid * nfp, nq + (fid + 1) * nfp)

            def face_view(vals, fill):
                a = vals.reshape(*fshapes[d], kb)
                return a if d == 0 else pad_x(a, fill)

            fvals = tuple(face_view(get_qh(f)[rows], quies.get(f, 0.0))
                          for f in range(nf))
            flog = tuple(face_view(get_qlog(l)[rows], 0.0)
                         for l in range(2))
            fluxes = ec_flux_fields(tuple(vol_d), fvals, tuple(log_d),
                                    flog, gamma, dirs=flux_dirs)
            fr = contract(fluxes)
            c = coeff_view(cface[fid, :, 0:1])
            face_rows[fid] = []
            for f in range(nf):
                w = c * fr[f]
                acc[f] = acc[f] + w
                fsum = -jnp.sum(w, axis=axis)
                if d != 0:   # face plane keeps the padded x axis: crop
                    fsum = fsum[..., :n1, :]
                face_rows[fid].append(fsum.reshape(nfp, kb))

    acc_flat = [a[:, :, :n1].reshape(nq, kb) for a in acc]
    return acc_flat, face_rows


def _fd_packed(get_qh, get_qlog, geo, cvol, cface, *, n1, nf, kb, gamma,
               dirs, diag, dtype):
    """Triangular fd body with PACKED-FOLD per-direction layouts
    (round-5 A/B against _fd_pad8, VERDICT item 5).

    _fd_pad8 pads the x axis to 8 sublanes, so every VPU op runs at
    5/8 occupancy at n1=5 (and ap/8 for the x-direction pair
    prefixes) — the accepted ~21% N=4 tax.  Here each direction d gets
    its own layout (pair_axis, fold(other two axes) -> m8, kb) with
    the fold of n1^2 = 25 rows padded to 32: pair prefixes/lines slice
    the LEADING axis (free), and every flux op runs at 25/32
    occupancy for all three directions.  The price is per-direction
    relayouts (transpose + sublane refold) of the nf+2 value arrays on
    entry and nf accumulators on exit.

    Same signature and return contract as _fd_pad8.
    """
    nq = n1 ** 3
    nfp = n1 * n1
    m8 = -(-nfp // 8) * 8
    quies = {0: 1.0, nf - 1: 1.0}   # rho = beta = 1 at padded rows

    def pad_fold(a, fill):
        # a: (n1, nfp, kb_) -> (n1, m8, kb_); no-op when the fold is
        # already tile-aligned (n1=4: nfp=16=2x8 -> zero-size concat
        # operands are rejected by Mosaic)
        if m8 == nfp:
            return a
        padshape = (a.shape[0], m8 - nfp) + a.shape[2:]
        return jnp.concatenate(
            [a, jnp.full(padshape, fill, a.dtype)], axis=1)

    # base rank-4 views (z, y, x, kb)
    base = [get_qh(f)[:nq].reshape(n1, n1, n1, kb) for f in range(nf)]
    base_log = [get_qlog(l)[:nq].reshape(n1, n1, n1, kb)
                for l in range(2)]
    # per-direction fold: leading = paired axis, fold order matches the
    # face-plane row ordering of the trace block (z-major over the two
    # non-paired axes in (z, y, x) order)
    perms = {0: (2, 0, 1, 3), 1: (1, 0, 2, 3), 2: (0, 1, 2, 3)}
    inv_perms = {0: (1, 2, 0), 1: (1, 0, 2), 2: (0, 1, 2)}

    def fold_dir(a, d, fill):
        return pad_fold(jnp.transpose(a, perms[d]).reshape(n1, nfp, kb),
                        fill)

    acc_flat = None
    face_rows = {}
    for d in dirs:
        vol_d = [fold_dir(base[f], d, quies.get(f, 0.0))
                 for f in range(nf)]
        log_d = [fold_dir(base_log[l], d, 0.0) for l in range(2)]
        flux_dirs = (d,) if diag else None
        if diag:
            geo_d = [geo[d * 3 + d, 0].reshape(1, 1, kb)]
        else:
            geo_d = [geo[d * 3 + x, 0].reshape(1, 1, kb)
                     for x in range(3)]

        def contract(fluxes):
            if diag:
                return [geo_d[0] * fluxes[0][f] for f in range(nf)]
            out = []
            for f in range(nf):
                t = None
                for x in range(3):
                    term = geo_d[x] * fluxes[x][f]
                    t = term if t is None else t + term
                out.append(t)
            return out

        def coeff_fold(row):
            # (nq, 1) pair coefficients -> (n1, m8, 1), zeros at pad
            c4 = row.reshape(n1, n1, n1, 1)
            return pad_fold(
                jnp.transpose(c4, perms[d]).reshape(n1, nfp, 1), 0.0)

        acc = [jnp.zeros((n1, m8, kb), dtype) for _ in range(nf)]
        for ap in range(1, n1):
            qi = tuple(v[:ap] for v in vol_d)
            li = tuple(l[:ap] for l in log_d)
            qj = tuple(v[ap:ap + 1] for v in vol_d)
            lj = tuple(l[ap:ap + 1] for l in log_d)
            fluxes = ec_flux_fields(qi, qj, li, lj, gamma,
                                    dirs=flux_dirs)
            fr = contract(fluxes)
            c = coeff_fold(cvol[d * n1 + ap, :, 0:1])[:ap]
            ztail = n1 - ap - 1
            for f in range(nf):
                w = c * fr[f]
                parts = [w, -jnp.sum(w, axis=0, keepdims=True)]
                if ztail:
                    parts.append(jnp.zeros((ztail, m8, kb), w.dtype))
                acc[f] = acc[f] + jnp.concatenate(parts, axis=0)

        for side in range(2):
            fid = 2 * d + side
            rows = slice(nq + fid * nfp, nq + (fid + 1) * nfp)
            # the face-plane row ordering already matches the fold
            fvals = tuple(
                pad_fold(get_qh(f)[rows].reshape(1, nfp, kb),
                         quies.get(f, 0.0)) for f in range(nf))
            flog = tuple(pad_fold(get_qlog(l)[rows].reshape(1, nfp, kb),
                                  0.0) for l in range(2))
            fluxes = ec_flux_fields(tuple(vol_d), fvals, tuple(log_d),
                                    flog, gamma, dirs=flux_dirs)
            fr = contract(fluxes)
            c = coeff_fold(cface[fid, :, 0:1])
            face_rows[fid] = []
            for f in range(nf):
                w = c * fr[f]
                acc[f] = acc[f] + w
                face_rows[fid].append(
                    -jnp.sum(w, axis=0)[:nfp].reshape(nfp, kb))

        # unfold this direction's accumulators back to flat (nq, kb)
        unfold = []
        for f in range(nf):
            a = acc[f][:, :nfp].reshape(n1, n1, n1, kb)
            unfold.append(
                jnp.transpose(
                    a, (*inv_perms[d], 3)).reshape(nq, kb))
        acc_flat = (unfold if acc_flat is None
                    else [a + u for a, u in zip(acc_flat, unfold)])

    return acc_flat, face_rows


def _fd_dir_pad8_kernel(qh_ref, qlog_ref, geo_ref, cvol_ref, cface_ref,
                        out_ref, *, n1, gamma, d, diag=False):
    """Split-path stage 2 on the sublane-padded fd body (_fd_pad8)."""
    nq = n1 ** 3
    nfp = n1 * n1
    nf = qh_ref.shape[0]
    kb = qh_ref.shape[2]
    qh = qh_ref[...]
    qlog = qlog_ref[...]
    acc_flat, face_rows = _fd_pad8(
        lambda f: qh[f], lambda l: qlog[l], geo_ref[...], cvol_ref[...],
        cface_ref[...], n1=n1, nf=nf, kb=kb, gamma=gamma, dirs=(d,),
        diag=diag, dtype=qh.dtype,
    )
    for f in range(nf):
        out_ref[f, :nq, :] = acc_flat[f]
        out_ref[f, nq:nq + nfp, :] = face_rows[2 * d][f]
        out_ref[f, nq + nfp:, :] = face_rows[2 * d + 1][f]


def _fd_dir_dense_chunked_kernel(qh_ref, qlog_ref, geo_ref, cvol_ref,
                                 cface_ref, out_ref, *, n1, gamma, d,
                                 rows_per_chunk=24):
    """Dense flat-partner fd with ROW-CHUNKED flux arithmetic.

    Same math as _fd_dir_dense_kernel, but every ec_flux_fields chain
    runs on a [rows_per_chunk, KB] slice of the flat volume arrays, so
    the whole ~20-temporary live set of one flux evaluation fits in a
    few vector registers per value instead of ceil(Nq/8) tiles each —
    probing whether the uniform ~4x per-pair cost at n1 = 5 is
    register/VMEM streaming pressure.
    """
    nq = n1 ** 3
    nfp = n1 * n1
    nf = qh_ref.shape[0]
    kb = qh_ref.shape[2]
    qh = qh_ref[...]
    qlog = qlog_ref[...]
    geo = geo_ref[...]
    cvol = cvol_ref[...]
    cface = cface_ref[...]

    shapes = {0: (nfp, n1), 1: (n1, n1, n1), 2: (n1, nfp)}
    axes = {0: 1, 1: 1, 2: 0}
    shape, axis = shapes[d], axes[d]
    vshape = (*shape, kb)

    vol = tuple(qh[f, :nq] for f in range(nf))      # flat [Nq, KB]
    vlog = tuple(qlog[l, :nq] for l in range(2))
    geo_flat = [geo[d * 3 + x, 0:1] for x in range(3)]

    def partner(x, ap):
        v = x.reshape(vshape)
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(ap, ap + 1)
        return jnp.broadcast_to(v[tuple(sl)], vshape).reshape(nq, kb)

    bounds = list(range(0, nq, rows_per_chunk)) + [nq]
    chunks = list(zip(bounds[:-1], bounds[1:]))

    def fd_pass(qj, lj, c):
        """One partner's weighted flux contribution, chunk by chunk."""
        parts = [[] for _ in range(nf)]
        for r0, r1 in chunks:
            qi_c = tuple(v[r0:r1] for v in vol)
            li_c = tuple(l[r0:r1] for l in vlog)
            qj_c = tuple(v[r0:r1] for v in qj)
            lj_c = tuple(l[r0:r1] for l in lj)
            fluxes = ec_flux_fields(qi_c, qj_c, li_c, lj_c, gamma)
            cc = c[r0:r1]
            for f in range(nf):
                fr = (geo_flat[0] * fluxes[0][f]
                      + geo_flat[1] * fluxes[1][f]
                      + geo_flat[2] * fluxes[2][f])
                parts[f].append(cc * fr)
        return [jnp.concatenate(p, axis=0) for p in parts]

    acc = [jnp.zeros((nq, kb), qh.dtype) for _ in range(nf)]
    for ap in range(n1):
        qj = tuple(partner(v, ap) for v in vol)
        lj = tuple(partner(l, ap) for l in vlog)
        w = fd_pass(qj, lj, cvol[d * n1 + ap, :, 0:1])
        for f in range(nf):
            acc[f] = acc[f] + w[f]

    face_rows = {}
    fshape = list(shape)
    fshape[axis] = 1
    for side in range(2):
        fid = 2 * d + side
        rows = slice(nq + fid * nfp, nq + (fid + 1) * nfp)

        def fpartner(xrow):
            v = xrow.reshape(*fshape, kb)
            return jnp.broadcast_to(v, vshape).reshape(nq, kb)

        fvals = tuple(fpartner(qh[f, rows]) for f in range(nf))
        flog = tuple(fpartner(qlog[l, rows]) for l in range(2))
        w = fd_pass(fvals, flog, cface[fid, :, 0:1])
        face_rows[side] = []
        for f in range(nf):
            acc[f] = acc[f] + w[f]
            face_rows[side].append(
                -jnp.sum(w[f].reshape(vshape), axis=axis).reshape(nfp, kb)
            )

    for f in range(nf):
        out_ref[f, :nq, :] = acc[f]
        out_ref[f, nq:nq + nfp, :] = face_rows[0][f]
        out_ref[f, nq + nfp:, :] = face_rows[1][f]


def _fd_dir_dense_kernel(qh_ref, qlog_ref, geo_ref, cvol_ref, cface_ref,
                         out_ref, *, n1, gamma, d, view_acc=False):
    """Dense flat-partner variant of _fd_dir_kernel (affine hex).

    Every flux evaluation and accumulation runs at the FLAT (Nq, KB)
    shape — clean (8, 128) Mosaic tiles — by broadcasting each partner
    line value to the full grid and folding the triangular bookkeeping
    into the dense S1 coefficient tensor (zero diagonal, skew negatives
    already present in cvol).  This trades ~2x more pair evaluations
    for fully aligned lowering: no odd-extent sublane slices, no
    per-pair concatenates, no partner-row reconstruction.  At n1 = 5
    (N = 4) those odd-extent ops cost ~4.7x per pair (PARITY.md round
    3), which is what this formulation removes.
    """
    nq = n1 ** 3
    nfp = n1 * n1
    nf = qh_ref.shape[0]
    kb = qh_ref.shape[2]
    qh = qh_ref[...]
    qlog = qlog_ref[...]
    geo = geo_ref[...]
    cvol = cvol_ref[...]
    cface = cface_ref[...]

    shapes = {0: (nfp, n1), 1: (n1, n1, n1), 2: (n1, nfp)}
    axes = {0: 1, 1: 1, 2: 0}
    shape, axis = shapes[d], axes[d]
    vshape = (*shape, kb)

    # view_acc: run everything in the direction's line view (one
    # view<->flat relayout per field at entry/exit); otherwise flat.
    if view_acc:
        wshape, unflat = vshape, (lambda a: a)
        vol = tuple(qh[f, :nq].reshape(vshape) for f in range(nf))
        vlog = tuple(qlog[l, :nq].reshape(vshape) for l in range(2))
        geo_c = [geo[d * 3 + x, 0].reshape((1,) * len(shape) + (kb,))
                 for x in range(3)]
        cv = cvol[:, :, 0:1].reshape(3 * n1, *shape, 1)
        cf = cface[:, :, 0:1].reshape(6, *shape, 1)
    else:
        wshape, unflat = (nq, kb), (lambda a: a.reshape(nq, kb))
        vol = tuple(qh[f, :nq] for f in range(nf))
        vlog = tuple(qlog[l, :nq] for l in range(2))
        geo_c = [geo[d * 3 + x, 0:1] for x in range(3)]
        cv = cvol[:, :, 0:1]
        cf = cface[:, :, 0:1]

    def partner(x, ap):
        v = x.reshape(vshape) if not view_acc else x
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(ap, ap + 1)
        return unflat(jnp.broadcast_to(v[tuple(sl)], vshape))

    def contract_c(fluxes, f):
        return (geo_c[0] * fluxes[0][f] + geo_c[1] * fluxes[1][f]
                + geo_c[2] * fluxes[2][f])

    acc = [jnp.zeros(wshape, qh.dtype) for _ in range(nf)]
    for ap in range(n1):
        qj = tuple(partner(v, ap) for v in vol)
        lj = tuple(partner(l, ap) for l in vlog)
        fluxes = ec_flux_fields(vol, qj, vlog, lj, gamma)
        c = cv[d * n1 + ap]
        for f in range(nf):
            acc[f] = acc[f] + c * contract_c(fluxes, f)

    face_rows = {}
    fshape = list(shape)
    fshape[axis] = 1
    for side in range(2):
        fid = 2 * d + side
        rows = slice(nq + fid * nfp, nq + (fid + 1) * nfp)

        def fpartner(xrow):
            v = xrow.reshape(*fshape, kb)
            return unflat(jnp.broadcast_to(v, vshape))

        fvals = tuple(fpartner(qh[f, rows]) for f in range(nf))
        flog = tuple(fpartner(qlog[l, rows]) for l in range(2))
        fluxes = ec_flux_fields(vol, fvals, vlog, flog, gamma)
        c = cf[fid]
        face_rows[side] = []
        for f in range(nf):
            w = c * contract_c(fluxes, f)
            acc[f] = acc[f] + w
            wv = w if view_acc else w.reshape(vshape)
            face_rows[side].append(
                -jnp.sum(wv, axis=axis).reshape(nfp, kb)
            )

    for f in range(nf):
        out_ref[f, :nq, :] = (acc[f].reshape(nq, kb) if view_acc
                              else acc[f])
        out_ref[f, nq:nq + nfp, :] = face_rows[0][f]
        out_ref[f, nq + nfp:, :] = face_rows[1][f]


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "nq", "line_ops", "block_k", "interpret",
                     "dense", "view_acc", "chunk_rows", "diag", "pad_x"),
)
def euler_volume_split_pallas(q, geo, ef, lift, gamma, *, nq,
                              line_ops: LineOps, block_k: int = 128,
                              interpret: bool = False, dense: bool = False,
                              view_acc: bool = False, chunk_rows: int = 0,
                              diag: bool = False, pad_x: bool = False):
    """Split fused volume stage (affine hex): projection kernel + three
    per-direction fd kernels + an XLA combine (Ph structure).

    Same contract as euler_volume_pallas; measured faster at N=4 where
    the all-in-one kernel's size degrades Mosaic scheduling (PARITY.md
    round 3).
    """
    nf, nq_, k = q.shape
    n1 = line_ops.n1d
    nfp = n1 * n1
    nfq = 6 * nfp
    nh = nq + nfq
    if geo.shape[1] != 1:
        raise ValueError("split volume path is affine-only")
    if pad_x and dense:
        raise ValueError("pad_x is only implemented for the non-dense "
                         "split fd kernels")

    kb = min(block_k, k)
    pad = (-k) % kb
    if pad:
        quiescent = jnp.zeros((nf,), q.dtype).at[0].set(1.0).at[-1].set(1.0)
        q = jnp.concatenate(
            [q, jnp.broadcast_to(quiescent[:, None, None], (nf, nq, pad))],
            axis=-1,
        )
        geo = jnp.pad(geo, ((0, 0), (0, 0), (0, pad)))
    kp = k + pad

    cvol_np, cface_np = _hex_line_coeffs(line_ops)
    cvol = jnp.asarray(cvol_np, q.dtype)
    cface = jnp.asarray(cface_np, q.dtype)
    w1 = np.asarray(line_ops.w1)
    idx = np.arange(nq)
    wq_np = w1[idx % n1] * w1[(idx // n1) % n1] * w1[idx // (n1 * n1)]
    fidx = np.arange(nfp)
    wf_np = w1[fidx % n1] * w1[fidx // n1]

    spec = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM,
    )
    rep = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    qh, qlog, traces = pl.pallas_call(
        functools.partial(_proj_kernel, gamma=gamma),
        grid=(kp // kb,),
        in_specs=[spec(nf, nq, kb), rep(nfq, nq)],
        out_specs=(spec(nf, nh, kb), spec(2, nh, kb), spec(7, nfq, kb)),
        out_shape=(
            jax.ShapeDtypeStruct((nf, nh, kp), q.dtype),
            jax.ShapeDtypeStruct((2, nh, kp), q.dtype),
            jax.ShapeDtypeStruct((7, nfq, kp), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, ef)

    # chunk_rows > 0 (dense only): row-chunked flux arithmetic — the
    # register/VMEM-streaming-pressure probe kernel
    if dense and chunk_rows:
        fd_kernel = functools.partial(_fd_dir_dense_chunked_kernel,
                                      rows_per_chunk=chunk_rows)
        fd_opts = {}
    elif pad_x and not dense:
        fd_kernel = _fd_dir_pad8_kernel
        fd_opts = {"diag": diag}
    else:
        fd_kernel = _fd_dir_dense_kernel if dense else _fd_dir_kernel
        fd_opts = {"view_acc": view_acc}
        if not dense:
            fd_opts["diag"] = diag
    parts = []
    for d in range(3):
        out_d = pl.pallas_call(
            functools.partial(fd_kernel, n1=n1, gamma=gamma, d=d,
                              **fd_opts),
            grid=(kp // kb,),
            in_specs=[
                spec(nf, nh, kb), spec(2, nh, kb), spec(9, 1, kb),
                rep(3 * n1, nq, 128), rep(6, nq, 128),
            ],
            out_specs=spec(nf, nq + 2 * nfp, kb),
            out_shape=jax.ShapeDtypeStruct((nf, nq + 2 * nfp, kp), q.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=interpret,
        )(qh, qlog, geo, cvol, cface)
        parts.append(out_d)

    # ---- XLA combine: Ph QF = QF_vol / wq + LIFT (QF_face / wf) ----
    acc_vol = sum(p[:, :nq] for p in parts)
    iw = jnp.asarray((1.0 / wq_np)[:, None], q.dtype)
    iwf = jnp.asarray((1.0 / wf_np)[:, None], q.dtype)
    qf_face = jnp.concatenate(
        [iwf[None] * parts[d][:, nq + side * nfp: nq + (side + 1) * nfp]
         for d in range(3) for side in range(2)],
        axis=1,
    )
    ph_qf = 2.0 * iw[None] * acc_vol + 2.0 * jnp.einsum(
        "ij,fjk->fik", lift, qf_face,
        precision=jax.lax.Precision.HIGHEST,
    )
    return ph_qf[:, :, :k], traces[:, :, :k]


def _surface_kernel(tr_ref, nbr_ref, nxj_ref, *rest, gamma, dissipation,
                    diag=False, nfp=0):
    """Fused surface stage: EC interface flux + LF dissipation + LIFT +
    combination with the volume part and the 1/J scaling.

    The LF wavespeeds of BOTH sides are computed locally from the
    exchanged conservative traces (pointwise), so lambda itself never
    crosses the interconnect.

    diag: axis-aligned meshes — each face-group normal has exactly one
    nonzero component, so the EC flux assembly and the normal
    contraction run per direction on the 2*nfp contiguous face rows of
    that direction (faces 2d and 2d+1 are adjacent row blocks), with
    the wavespeed's normal momentum taken directly from component d.
    In diag mode nxj_ref holds the COMPACT one-row normal (each face
    point's single nonzero component) and sj / 1/sj are derived
    in-kernel (sj = |nxj| exactly there), dropping four [Nfq, K] HBM
    streams from the kernel's inputs.
    """
    gm1 = gamma - 1.0
    if diag:
        ij_ref, lift_ref, phqf_ref, out_ref = rest
        sj = isj = None
    else:
        sj_ref, isj_ref, ij_ref, lift_ref, phqf_ref, out_ref = rest
        sj = sj_ref[...]
        isj = isj_ref[...]
    tr = tr_ref[...]
    nbr = nbr_ref[...]
    nxj = nxj_ref[...]
    inv_jac = ij_ref[...]
    lift = lift_ref[...]
    phqf = phqf_ref[...]

    def conservative(q5):
        # (rho, u, beta) -> (rho, m, E) with p = rho/(2 beta)
        rho, u1, u2, u3, beta = q5
        u2norm = u1 * u1 + u2 * u2 + u3 * u3
        e = rho / (2.0 * beta * gm1) + 0.5 * rho * u2norm
        return rho, rho * u1, rho * u2, rho * u3, e

    def group_flux(qm, qp, logs_m, logs_p, nxj_g, sj_g, isj_g, dirs):
        """EC flux + LF for one row group (or the whole face set)."""
        fluxes = ec_flux_fields(qm, qp, logs_m, logs_p, gamma, dirs=dirs)
        if dirs is None:
            flux = [sum(fluxes[x][f] * nxj_g[x] for x in range(3))
                    for f in range(5)]
        else:
            flux = [fluxes[0][f] * nxj_g[0] for f in range(5)]
        if dissipation:
            um = conservative(qm)
            up = conservative(qp)

            def lam(u):
                rho, m1, m2, m3, e = u
                if dirs is None:
                    un = (m1 * nxj_g[0] + m2 * nxj_g[1]
                          + m3 * nxj_g[2]) * isj_g
                else:
                    un = (m1, m2, m3)[dirs[0]] * nxj_g[0] * isj_g
                p = gm1 * (e - 0.5 * un * un / rho)
                return jnp.abs(un / rho) + jnp.sqrt(gamma * p / rho)

            lfc = 0.25 * jnp.maximum(lam(um), lam(up)) * sj_g
            for f in range(5):
                flux[f] = flux[f] - lfc * (up[f] - um[f])
        return flux

    if diag:
        parts = []
        for d in range(3):
            rows = slice(2 * d * nfp, 2 * (d + 1) * nfp)
            nxj_g = nxj[0, rows]
            sj_g = jnp.abs(nxj_g)           # = sqrt(nxj_d^2): exact
            parts.append(group_flux(
                tuple(tr[i, rows] for i in range(5)),
                tuple(nbr[i, rows] for i in range(5)),
                (tr[5, rows], tr[6, rows]),
                (nbr[5, rows], nbr[6, rows]),
                (nxj_g,), sj_g, 1.0 / sj_g, (d,),
            ))
        flux = [jnp.concatenate([parts[d][f] for d in range(3)], axis=0)
                for f in range(5)]
    else:
        flux = group_flux(
            tuple(tr[i] for i in range(5)),
            tuple(nbr[i] for i in range(5)),
            (tr[5], tr[6]), (nbr[5], nbr[6]),
            tuple(nxj[x] for x in range(3)), sj, isj, None,
        )

    for f in range(5):
        out_ref[f] = -(phqf[f] + jnp.dot(
            lift, flux[f], preferred_element_type=tr.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )) * inv_jac


@functools.partial(
    jax.jit, static_argnames=("gamma", "dissipation", "block_k", "interpret",
                              "diag")
)
def euler_surface_pallas(traces, nbr, nxj, sj, inv_sj, inv_jac, lift, ph_qf,
                         gamma, *, dissipation=True, block_k: int = 128,
                         interpret: bool = False, diag: bool = False):
    """Fused surface stage; returns the complete RHS dq [5, Nq, K].

    diag: pass nxj as the COMPACT [1, Nfq, K] normal (each face point's
    single nonzero component, e.g. ``(nxj[0]+nxj[1]+nxj[2])[None]`` on
    a snapped axis-aligned mesh) and inv_jac as its first row [1, K]
    (affine: all rows equal); sj / inv_sj are ignored (derived
    in-kernel) and may be anything array-shaped — the kernel streams
    four fewer [Nfq, K] inputs and one fewer [Nq-1, K]."""
    nfq, k = traces.shape[1:]
    nq = ph_qf.shape[1]
    nij = inv_jac.shape[0]
    kb = min(block_k, k)
    pad = (-k) % kb
    if diag:
        ins = [traces, nbr, nxj, inv_jac, lift, ph_qf]
    else:
        ins = [traces, nbr, nxj, sj, inv_sj, inv_jac, lift, ph_qf]
    if pad:
        padk = lambda a: jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, pad),),
                                 constant_values=1.0)
        ins = [a if a is lift else padk(a) for a in ins]
    kp = k + pad

    kernel = functools.partial(_surface_kernel, gamma=gamma,
                               dissipation=dissipation, diag=diag,
                               nfp=nfq // 6)
    spec = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM,
    )
    lift_spec = pl.BlockSpec((nq, nfq), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    if diag:
        in_specs = [spec(7, nfq, kb), spec(7, nfq, kb), spec(1, nfq, kb),
                    spec(nij, kb), lift_spec, spec(5, nq, kb)]
    else:
        in_specs = [spec(7, nfq, kb), spec(7, nfq, kb), spec(3, nfq, kb),
                    spec(nfq, kb), spec(nfq, kb), spec(nij, kb), lift_spec,
                    spec(5, nq, kb)]
    out = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=in_specs,
        out_specs=spec(5, nq, kb),
        out_shape=jax.ShapeDtypeStruct((5, nq, kp), traces.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*ins)
    return out[:, :, :k]
