"""Smoke test of the end-to-end location driver: a synthetic off-lattice
catalogue (fine forward grid, coarse locator) must refine below the
grid-search error."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_location_example_refines():
    from example_location import run

    out = run(32, 8, 250.0, n_events=4, verbose=False)
    assert out["refined_err"] < out["node_err"], out
    assert out["refined_err"] < 150.0, out        # measured ~77 km
