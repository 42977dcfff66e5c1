"""Fused ES-DG volume kernel for MODAL (non-collocated) elements.

The tri/modal analogue of ops.pallas_volume (which requires collocated
tensor-product elements): one Pallas kernel per element block computes,
entirely in VMEM,

  1. quadrature interpolation Uq = Vq U (MXU),
  2. entropy variables V = v(Uq),
  3. hybridized entropy projection Vh = (Vh Pq) V (MXU) and the inverse
     map U(Vh) at all Nh hybridized points,
  4. flux variables (rho, u, beta) + logs,
  5. triangular skew-symmetric flux differencing (each pair once,
     zero face-face block skipped; ops.pallas_fd.triangular_fd),
  6. the projection Ph QF (MXU),

and emits the partial volume RHS [Nf, Np, KB], the face traces needed
by the surface/neighbor stage (flux variables + their logs — one
concatenated [Nf + 2, Nfq, KB] block; the conservative and
entropy-variable traces are POINTWISE-RECOVERABLE from these via the
exact inverse maps, so the consumer rebuilds them instead of streaming
8 more HBM rows per block — solvers._shared.flux_to_conservative /
entropy_vars_from_flux, the same comm-avoiding recompute the neighbor
side of the exchange already does), and the raw entropy variables at
quadrature (the viscous front end of solvers.cns_fused consumes
them).  This removes every HBM round-trip between the projection,
physics maps, flux differencing and Ph stages of the XLA path
(SURVEY.md 2.5 items 1-3; reference rhs structure
dg2D_euler_tri.jl:130-186 steps 1-2-6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fd import fd_body
from .pallas_volume import _VMEM_LIMIT
from .pallas_volume import dot_highest as _dot


def _modal_volume_kernel(qs_ref, q_ref, geo_ref, vq_ref, vhp_ref, ph_ref,
                         out_ref, traces_ref, vuq_ref, *, dim, nq, nh,
                         gamma, curved, fd_mode):
    nf = dim + 2
    gm1 = gamma - 1.0

    q = q_ref[...]                     # [Nf, Np, KB]
    qs = qs_ref[...]                   # [dim, Nh, Nh]
    geo = geo_ref[...]                 # [dim*dim, Ng, KB]
    vq = vq_ref[...]                   # [Nq, Np]
    vhp = vhp_ref[...]                 # [Nh, Nq]
    ph = ph_ref[...]                   # [Np, Nh]

    # ---- 1-2: quadrature values + entropy variables ----
    uq = [_dot(vq, q[f]) for f in range(nf)]
    rho, e = uq[0], uq[-1]
    mom = uq[1:-1]
    p = gm1 * (e - 0.5 * sum(m * m for m in mom) / rho)
    s = jnp.log(p) - gamma * jnp.log(rho)
    v1 = (gamma + 1.0 - s) - gm1 * e / p
    vm = [gm1 * m / p for m in mom]
    ve = -gm1 * rho / p
    vuq_ref[0] = v1
    for d in range(dim):
        vuq_ref[1 + d] = vm[d]
    vuq_ref[nf - 1] = ve

    # ---- 3: hybridized projection + inverse map ----
    hv1 = _dot(vhp, v1)
    hvm = [_dot(vhp, v) for v in vm]
    hve = _dot(vhp, ve)
    vnorm = sum(v * v for v in hvm)
    sf = gamma - hv1 + vnorm / (2.0 * hve)
    rhoe = (gm1 / (-hve) ** gamma) ** (1.0 / gm1) * jnp.exp(-sf / gm1)
    hrho = rhoe * (-hve)
    he = rhoe * (1.0 - vnorm / (2.0 * hve))

    # ---- 4: flux variables + logs at all hybridized points ----
    hu = [v / (-hve) for v in hvm]     # = hmom / hrho
    hp = gm1 * (he - 0.5 * hrho * sum(u * u for u in hu))
    hbeta = hrho / (2.0 * hp)
    qh = [hrho, *hu, hbeta]
    qlog = [jnp.log(hrho), jnp.log(hbeta)]

    # ---- traces: [qm (Nf) | logs (2)]; uf / vuf are rebuilt pointwise
    # by the consumer (exact inverse maps — see module docstring) ----
    for f in range(nf):
        traces_ref[f] = qh[f][nq:, :]
    traces_ref[nf] = qlog[0][nq:, :]
    traces_ref[nf + 1] = qlog[1][nq:, :]

    # ---- 5: triangular flux differencing (pair work halved,
    # face-face block skipped; ops.pallas_fd.triangular_fd) ----
    acc = fd_body(tuple(qh), tuple(qlog), qs, geo, dim=dim, nq=nq,
                  nh=nh, gamma=gamma, curved=curved, mode=fd_mode)

    # ---- 6: Ph QF ----
    for f in range(nf):
        out_ref[f] = 2.0 * _dot(ph, acc[f])


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "nq", "block_k", "interpret", "fd_mode"),
)
def euler_modal_volume_pallas(q, geo, q_skew, vq, vhp, ph, gamma, *, nq,
                              block_k: int = 1024, interpret: bool = False,
                              fd_mode: str = "tri"):
    """Fused modal volume stage.

    Args:
      q: [Nf, Np, K] conservative state; geo [dim*dim, Ng, K];
      q_skew: tuple of dim [Nh, Nh] skew operators; vq [Nq, Np];
      vhp [Nh, Nq]; ph [Np, Nh].
    Returns (ph_qf [Nf, Np, K], traces [Nf + 2, Nfq, K],
             vu_q [Nf, Nq, K]) with traces rows
             (qm | log rho, log beta); the conservative / entropy
             traces are pointwise functions of these (consumers rebuild
             them — solvers._shared).
    """
    nf, np_, k = q.shape
    dim = len(q_skew)
    nh = vhp.shape[0]
    nfq = nh - nq
    curved = geo.shape[1] != 1
    qs = jnp.stack(q_skew)

    kb = min(block_k, k)
    pad = (-k) % kb
    if pad:
        # pad lanes with a valid quiescent state (rho=1, mom=0, E=1, so
        # p>0): the padded columns are sliced off afterwards, but
        # log/pow in the kernel must stay finite on them (jax_debug_nans,
        # and robustness against any future cross-lane op)
        quiescent = jnp.zeros((nf,), q.dtype).at[0].set(1.0).at[-1].set(1.0)
        q = jnp.concatenate(
            [q, jnp.broadcast_to(quiescent[:, None, None], (nf, np_, pad))],
            axis=-1,
        )
        geo = jnp.pad(geo, ((0, 0), (0, 0), (0, pad)))
    kp = k + pad
    ng = geo.shape[1]

    kernel = functools.partial(
        _modal_volume_kernel, dim=dim, nq=nq, nh=nh, gamma=gamma,
        curved=curved, fd_mode=fd_mode,
    )
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    blk = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 1) + (i,),
        memory_space=pltpu.VMEM,
    )
    out, traces, vu_q = pl.pallas_call(
        kernel,
        grid=(kp // kb,),
        in_specs=[
            rep((dim, nh, nh)),
            blk(nf, np_, kb),
            blk(geo.shape[0], ng, kb),
            rep((nq, np_)),
            rep((nh, nq)),
            rep((np_, nh)),
        ],
        out_specs=(
            blk(nf, np_, kb),
            blk(nf + 2, nfq, kb),
            blk(nf, nq, kb),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nf, np_, kp), q.dtype),
            jax.ShapeDtypeStruct((nf + 2, nfq, kp), q.dtype),
            jax.ShapeDtypeStruct((nf, nq, kp), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qs, q, geo, vq, vhp, ph)
    return out[:, :, :k], traces[:, :, :k], vu_q[:, :, :k]
