"""End-to-end linearized tomography demo: the sensitivity matrix must
explain synthetic checkerboard travel-time residuals and recover the
anomaly pattern over the ray-covered nodes."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_checkerboard_recovery():
    from example_tomography import run

    out = run(32, 8, 250.0, verbose=False, n_src=8, n_rec=24)
    # the linear model must explain nearly all of the residual
    assert out["misfit1"] < 0.1 * out["misfit0"], (out["misfit0"],
                                                   out["misfit1"])
    # and the recovered dU/U must correlate with the planted pattern
    assert out["corr"] > 0.25, out["corr"]
    assert out["covered"].sum() > 100
