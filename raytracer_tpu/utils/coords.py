"""Coordinate transforms and distances (2-D polar and 3-D spherical).

Equivalents of the reference helpers in src/GridAnnulus.jl:35-55,700-725,
806-856 and src/StructuredGrid.jl:225-255, written array-first for NumPy /
JAX (all functions work on both np.ndarray and jnp.ndarray inputs).
"""
from __future__ import annotations

import numpy as np


def polar2cartesian(theta, r):
    """(theta, r) -> (x, z) with x = r sin(theta), z = r cos(theta).

    Matches the reference @cartesian macro (src/GridAnnulus.jl:27-29).
    """
    return r * np.sin(theta), r * np.cos(theta)


def cartesian2polar(x, z):
    """(x, z) -> (theta, r), theta in [0, 2pi) (src/GridAnnulus.jl:35-51)."""
    theta = np.arctan2(x, z)
    theta = np.where(theta < 0, theta + 2 * np.pi, theta)
    return theta, np.sqrt(x * x + z * z)


def distance2d(ax, az, bx, bz):
    """Euclidean distance in the (x, z) plane (src/GridAnnulus.jl:806)."""
    return np.sqrt((ax - bx) ** 2 + (az - bz) ** 2)


def polardistance(theta1, theta2, r1, r2):
    """Chord length between two polar points (src/GridAnnulus.jl:706)."""
    return np.sqrt(r1 * r1 + r2 * r2 - 2 * r1 * r2 * np.cos(theta1 - theta2))


def arclength(theta1, theta2, r):
    """Arc length along a circle of radius r (src/GridAnnulus.jl:708)."""
    return r * np.abs(theta2 - theta1)


def spherical2cart(theta, phi, r):
    """Spherical -> cartesian (src/StructuredGrid.jl:225-231)."""
    x = r * np.cos(phi) * np.sin(theta)
    y = r * np.sin(phi) * np.sin(theta)
    z = r * np.cos(theta)
    return x, y, z


def distance3d(ax, ay, az, bx, by, bz):
    """Euclidean distance in 3-D (src/StructuredGrid.jl:239-241)."""
    return np.sqrt((ax - bx) ** 2 + (ay - by) ** 2 + (az - bz) ** 2)
