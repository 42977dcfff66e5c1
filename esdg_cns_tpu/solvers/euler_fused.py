"""Fully fused ES-DG Euler RHS for collocated periodic hex meshes.

The production fast path for the benchmark configuration: the volume
stage (entropy projection, flux differencing, Ph application) runs as a
single Pallas kernel (ops.pallas_volume); only the neighbor exchange,
the surface EC flux + LF dissipation, and the LIFT remain as XLA ops.

Semantics identical to make_euler_rhs(..., flux_diff_impl='lines');
tested against it to roundoff.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.discretization import Discretization
from ..ops.pallas_volume import euler_surface_pallas, euler_volume_pallas
from ..physics import euler as phys


def make_euler_rhs_fused(
    disc: Discretization,
    *,
    gamma: float = phys.GAMMA,
    dissipation: bool = True,
    compute_rhstest: bool = False,
    rhstest_mode: str = "native",
    block_k: Optional[int] = None,
    gather_fn=None,
    psum_axis: Optional[str] = None,
    interpret: bool = False,
    force_fused: bool = False,
    volume_mode: str = "auto",
    axis_aligned: Optional[bool] = None,
    surface_block_k: Optional[int] = None,
):
    """Fused-RHS builder; requires a collocated hex discretization.

    The round-3 matched-DOF study (PARITY.md, examples/n4_perf_study.py)
    corrected the round-2 comparison: with dispatch-floor-calibrated
    timing at N=4, K=13824 the fused kernel is the FASTEST path, and
    the block_k sweep closed the N=4 cliff — the split path at its
    default 512-lane blocks runs the full RHS at 1.48e9 DOF*stage/s
    (vs 6.6e8 at 128-lane blocks; n1=5 sublane-misaligned ops are
    per-op-overhead-bound, amortized by lane width), and the same
    recipe carries N=5 to 1.57e9 vs the lines path's 6.3e8 (K=4096),
    so fused-split is the default through N=5.  The unrolled-line
    temporaries need the 100 MB scoped-VMEM budget set in
    ops.pallas_volume.  N >= 6 still falls back to the XLA lines path:
    the kernel stack grows further and is unmeasured there."""
    if disc.elem_type != "hex" or disc.line_ops is None:
        raise ValueError("fused RHS requires a collocated hex mesh")
    if disc.n >= 6 and not force_fused:
        # the fallback must not silently drop kernel-tuning flags: a
        # block_k sweep (or interpret=True expectation) at N=6 would
        # otherwise measure the lines path for every value
        dropped = {"block_k": block_k, "interpret": interpret or None,
                   "axis_aligned": axis_aligned,
                   "surface_block_k": surface_block_k,
                   "volume_mode": None if volume_mode == "auto"
                   else volume_mode}
        set_flags = [k for k, v in dropped.items() if v is not None]
        if set_flags:
            raise ValueError(
                f"N={disc.n} >= 6 falls back to the XLA lines path, "
                f"which ignores {set_flags}; drop these arguments, use "
                f"make_euler_rhs directly, or pass force_fused=True")
        from .euler import make_euler_rhs

        return make_euler_rhs(
            disc, gamma=gamma, dissipation=dissipation,
            flux_diff_impl="lines", compute_rhstest=compute_rhstest,
            rhstest_mode=rhstest_mode,
            gather_fn=gather_fn, psum_axis=psum_axis,
        )
    nq = disc.nq
    ef = disc.vhp[nq:]
    gather = disc.gather_traces if gather_fn is None else gather_fn

    # axis_aligned: on uniform/cartesian meshes the metric is diagonal
    # and each face group's normal has one nonzero component, so the
    # kernels statically skip the cross-direction flux assembly and
    # contraction terms (~1/3 of the per-pair VPU ops).  None = detect
    # at build time (host-side numpy); the curved path is unaffected.
    if axis_aligned is None:
        from ..ops.pallas_volume import detect_axis_aligned

        axis_aligned = detect_axis_aligned(disc)

    # volume_mode: 'joint' = the all-in-one kernel; 'split' = projection
    # kernel + per-direction fd kernels + XLA combine; '*_pad8' =
    # sublane-padded fd body (x axis padded to a full 8-row tile;
    # affine only) — at misaligned degrees (8 % n1 != 0) this removes
    # the per-op misalignment overhead that made round 3's split path
    # look best (N=4: split 1.40e9 -> joint_pad8 2.60e9 DOF*stage/s;
    # N=5: 1.61e9 -> 2.51e9); 'split_dense' = split with dense
    # flat-partner fd kernels (measured SLOWER than triangular — kept
    # as the controlled experiment that rules out odd-extent sublane
    # slicing as the N=4 cost driver, PARITY.md round 3); 'auto' picks
    # by alignment and order (affine meshes only for pad8/split).
    if volume_mode == "auto":
        n1 = disc.n + 1
        if disc.affine and 8 % n1 != 0:
            # round 5: the packed-fold fd body beats pad8 1.38x in
            # isolation at n1=5 and +21% on the full N=4 RHS
            # (2.66e9 -> 3.21e9 DOF*stage/s, one v5e, median of 7)
            volume_mode = "joint_packed"
        elif disc.affine and n1 == 4:
            # aligned n1=4 also wins packed: the view path's 4-row
            # line extents are half 8-sublane tiles, the 16-row fold
            # is exactly two full tiles (N=3 full RHS 3.36e9 ->
            # 3.98e9 at block_k=256, round 5)
            volume_mode = "joint_packed"
        elif disc.n >= 4 and disc.affine:
            volume_mode = "split"
        else:
            volume_mode = "joint"
    if volume_mode == "split_dense":
        from ..ops.pallas_volume import euler_volume_split_pallas

        _vol = functools.partial(euler_volume_split_pallas, dense=True)
    elif volume_mode == "split_pad8":
        # split with the x-axis sublane-padded triangular fd kernels
        # (every line one full 8-row tile; round-4 experiment)
        from ..ops.pallas_volume import euler_volume_split_pallas

        _vol = functools.partial(euler_volume_split_pallas, pad_x=True,
                                 diag=axis_aligned)
    elif volume_mode == "split":
        from ..ops.pallas_volume import euler_volume_split_pallas

        _vol = functools.partial(euler_volume_split_pallas,
                                 diag=axis_aligned)
    elif volume_mode == "joint_pad8":
        _vol = functools.partial(euler_volume_pallas, pad_x=True,
                                 diag=axis_aligned)
    elif volume_mode == "joint_packed":
        # packed-fold fd body (round 5): per-direction
        # (pair_axis, fold->tile) layouts, 25/32 occupancy at n1=5
        # instead of pad8's 5/8 (and full 2-tile folds at n1=4)
        _vol = functools.partial(euler_volume_pallas, pad_x=True,
                                 packed=True, diag=axis_aligned)
    else:
        _vol = functools.partial(euler_volume_pallas, diag=axis_aligned)
    if surface_block_k is None:
        # the surface kernel's work is row-light (Nfq face rows, one
        # LIFT dot) and prefers wide lane blocks at every order
        # (measured: N=3 surface 1.04 -> 0.98 ms going 128 -> 512);
        # when block_k is given explicitly (tests, tiny K) it wins
        surface_block_k = 512 if block_k is None else block_k
    if block_k is None:
        from ..ops.pallas_volume import default_block_k

        block_k = default_block_k(disc.n, volume_mode)

    if axis_aligned:
        # compact one-row normal: each face point's single nonzero
        # component (the others are snapped exact zeros) — the surface
        # kernel derives sj = |nxj| and 1/sj in-VMEM, streaming four
        # fewer [Nfq, K] HBM inputs
        nxj = (disc.nxj[0] + disc.nxj[1] + disc.nxj[2])[None]
    else:
        nxj = jnp.stack(disc.nxj)

    def rhs(q, t: float = 0.0):
        del t
        ph_qf, traces = _vol(
            q, disc.geo, ef, disc.lift, gamma,
            nq=nq, line_ops=disc.line_ops, block_k=block_k,
            interpret=interpret,
        )
        nbr = gather(traces)
        rhs_q = euler_surface_pallas(
            traces, nbr, nxj, disc.sj, disc.inv_sj,
            disc.inv_jac[:1] if axis_aligned else disc.inv_jac,
            disc.lift, ph_qf, gamma,
            dissipation=dissipation, block_k=surface_block_k,
            interpret=interpret, diag=axis_aligned,
        )

        aux = {}
        if compute_rhstest:
            from ..utils.compensated import weighted_entropy_residual

            vu = phys.v_ufun(q, gamma)  # collocated: Vq = I
            rt = weighted_entropy_residual(disc.wjq, vu, rhs_q, rhstest_mode)
            if psum_axis is not None:
                rt = jax.lax.psum(rt, psum_axis)
            aux["rhstest"] = rt
        return rhs_q, aux

    return rhs
