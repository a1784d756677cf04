"""Model-layer subpackage: meshes, velocity models, partitions."""
