"""Device op subpackage: graph layouts, weights, relaxation kernels."""
