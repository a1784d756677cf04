"""SSSP solvers and path utilities."""
