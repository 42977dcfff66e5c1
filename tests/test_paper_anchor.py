"""Reference-configuration Becker anchor artifact (round 5).

examples/paper_anchor.py runs the Mach-3 Becker shocktube at the
reference 1D CNS driver's exact configuration and norm conventions
(dg1D_CNS_modalESDG.jl:83-103, 497-512) in f64 and records the error
table the paper behind the reference (arXiv:2011.11089) tabulates for
this workload.  These tests (a) pin the artifact against regression by
recomputing its cheapest cell live, and (b) assert the design-order
convergence rates the table must carry.  The paper PDF itself is not
reachable offline; the artifact documents that honestly and is
directly comparable by any reader with access (docstring of the
example).
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "results",
                   "paper_anchor_r05.json")


def _rows():
    with open(ART) as f:
        return json.load(f)["rows"]


def test_artifact_shape_and_reference_row():
    rows = _rows()
    assert len(rows) == 9
    ref = [r for r in rows if r["n"] == 4 and r["k"] == 128]
    assert len(ref) == 1
    # f64 + tight time tolerance: the reference-config row must sit at
    # the design-order error level, far below the f32/tol floors that
    # invalidated earlier attempts (1.49e-8 recorded)
    assert ref[0]["l2"] < 1e-7


def test_design_order_rates():
    rows = _rows()
    for n, min_rate in ((2, 2.8), (3, 3.5), (4, 4.5)):
        sub = sorted((r for r in rows if r["n"] == n),
                     key=lambda r: r["k"])
        rates = [np.log2(a["l2"] / b["l2"]) for a, b in zip(sub, sub[1:])]
        assert min(rates) > min_rate, (n, rates)


@pytest.mark.slow
def test_cheapest_cell_reproduces():
    """Live recompute of the N=2, K=32 cell (seconds in f64 on CPU)
    against the artifact — catches any semantic drift in the solver,
    the BC bundle, or the norm definitions."""
    from esdg_cns_tpu.verification import becker_shocktube_errors

    row = [r for r in _rows() if r["n"] == 2 and r["k"] == 32][0]
    # looser time tolerance: the tol study showed this cell's L2 is
    # spatially dominated and tol-insensitive to 4+ digits
    live = becker_shocktube_errors(2, 32, err_tol=1e-9)
    assert abs(live["l2"] - row["l2"]) < 1e-3 * row["l2"], (live, row)
    assert abs(live["linf"] - row["linf"]) < 1e-2 * row["linf"]
