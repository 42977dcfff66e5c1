"""Vendored external benchmark data for the Taylor-Green vortex.

Re = 1600 is THE standard quantitative TGV verification case (case 3.5
of the 1st International Workshop on High-Order CFD Methods).  The
kinetic-energy dissipation-rate history -dKE*/dt* of the incompressible
DNS is tabulated by van Rees, Leonard, Pullin & Koumoutsakos,
"A comparison of vortex and pseudo-spectral methods for the simulation
of periodic vortical flows at high Reynolds numbers", J. Comput. Phys.
230 (2011) 2794-2805 (512^3 spectral DNS), and reproduced by DeBonis,
"Solutions of the Taylor-Green vortex problem using high-resolution
explicit finite difference methods", AIAA 2013-0382.  Headline values
of that DNS curve:

    peak dissipation rate   eps_peak = 0.01208 +- ~1%
    at convective time      t*_peak  = 9.03

(The workshop's reference data file gives the peak as ~0.0122 at
t* = 9.0; digitizations across the reproduction literature scatter by
about 1% in eps_peak and ~0.1 in t*_peak, which is folded into the
tolerances below.)

These are published, widely-reproduced VALUES vendored like the Ghia
cavity tables (physics/cavity_benchmarks.py) — an external anchor the
repo's self-generated oracles cannot provide.  The reference
(yiminllin/ESDG-CNS) has no TGV workload at all, so this anchors a
beyond-reference claim.

Comparison caveats (encoded in the tolerances):
  * Our solver is COMPRESSIBLE at Ma = 0.1; compressible TGV results
    at this Mach differ from the incompressible DNS by well under 1%
    in eps_peak (DeBonis runs at Ma = 0.1 as well).
  * Resolution: the DNS is 512^3.  At the 64^3-DOF resolution the
    examples run (N=3, K1D=16), under-resolution at the dissipation
    peak typically LOWERS eps_peak by ~5-12% and shifts t*_peak by a
    few tenths (workshop p=3 64^3 submissions cluster there), hence
    the default tolerances below are resolution-graded, not DNS-grade.
"""

# incompressible 512^3 spectral DNS headline values (van Rees et al.
# 2011; workshop case 3.5 reference data)
RE1600_EPS_PEAK = 0.01208
RE1600_T_STAR_PEAK = 9.03

# resolution-graded acceptance bands for the example runs
# (dof_1d = (N+1) * K1D, the DOF-resolution per direction)
RE1600_TOLERANCES = {
    # dof_1d >= threshold: (rel tol on eps_peak, abs tol on t*_peak)
    256: (0.03, 0.25),
    128: (0.08, 0.5),
    64: (0.15, 0.8),
}


def re1600_tolerance(dof_1d: int):
    """(eps_rel_tol, t_abs_tol) for a given per-direction resolution."""
    for thresh in sorted(RE1600_TOLERANCES, reverse=True):
        if dof_1d >= thresh:
            return RE1600_TOLERANCES[thresh]
    raise ValueError(
        f"dof_1d = {dof_1d} is below the minimum anchored resolution "
        "(64^3): the dissipation peak is not resolution-converged enough "
        "to compare against the DNS value")


def compare_re1600(eps_peak: float, t_star_peak: float, dof_1d: int):
    """Compare a measured (eps_peak, t*_peak) against the DNS anchor.

    Returns a dict with the anchor values, deviations, tolerances, and
    boolean passes — the fields examples/dg3d_cns_tgv.py records in its
    results artifact."""
    eps_tol, t_tol = re1600_tolerance(dof_1d)
    eps_dev = abs(eps_peak - RE1600_EPS_PEAK) / RE1600_EPS_PEAK
    t_dev = abs(t_star_peak - RE1600_T_STAR_PEAK)
    return {
        "anchor": {"eps_peak": RE1600_EPS_PEAK,
                   "t_star_peak": RE1600_T_STAR_PEAK,
                   "source": "van Rees et al. JCP 230 (2011) 512^3 DNS; "
                             "HiOCFD workshop case 3.5 / DeBonis "
                             "AIAA 2013-0382"},
        "measured": {"eps_peak": eps_peak, "t_star_peak": t_star_peak,
                     "dof_1d": dof_1d},
        "eps_rel_dev": eps_dev,
        "t_star_abs_dev": t_dev,
        "eps_rel_tol": eps_tol,
        "t_star_abs_tol": t_tol,
        "eps_pass": bool(eps_dev <= eps_tol),
        "t_star_pass": bool(t_dev <= t_tol),
    }
