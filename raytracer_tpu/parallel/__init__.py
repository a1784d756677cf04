"""Multi-chip sharding utilities."""
