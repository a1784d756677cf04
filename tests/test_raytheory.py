"""Ray-theory validation: the independent physics anchor for SPM times."""
import numpy as np
import pytest

import raytracer_tpu as rt
from raytracer_tpu.config import R, SolverConfig
from raytracer_tpu.models.raytheory import ak135_first_arrivals, first_arrival

F64 = SolverConfig(dtype="float64")


def test_constant_velocity_exact():
    r = np.linspace(0, R, 500)
    v = np.full_like(r, 10.0)
    degs = np.array([10.0, 45.0, 90.0, 130.0])
    t = first_arrival(degs, r, v, n_p=4000)
    exact = 2 * R * np.sin(np.deg2rad(degs) / 2) / 10.0
    np.testing.assert_allclose(t, exact, rtol=1e-4)


def test_ak135_published_values():
    """First arrivals must match the published AK135 P times (~1-2 s of
    slack for the 1-km table discretisation)."""
    degs = np.array([10.0, 30.0, 60.0, 90.0])
    t = ak135_first_arrivals(degs)
    published = np.array([144.5, 371.5, 606.0, 780.0])
    assert np.all(np.abs(t - published) < 4.0), t


def test_spm_vs_ray_theory(tiny_annulus, tiny_velocity):
    """SPM times upper-bound ray theory and converge from above; on the
    coarse test grid the overshoot stays within a few percent."""
    gr, A, halo = tiny_annulus
    src = rt.closest_point(gr, 0.0, R, system="polar")
    D = rt.bfm(A, halo, src, gr, tiny_velocity, F64)
    degs = np.array([30.0, 60.0, 90.0])
    recs = [rt.closest_point(gr, np.deg2rad(d), R, system="polar") for d in degs]
    t_spm = D.dist[recs]
    t_ray = ak135_first_arrivals(degs)
    # upper bound (allow halo teleports + discretised velocity slack)
    assert np.all(t_spm > t_ray - 2.0)
    # coarse 16-column grid: generous 8% overshoot budget
    assert np.all(t_spm < t_ray * 1.08)
