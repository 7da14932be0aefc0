"""Multi-chip parallelism: the drone axis as a device-mesh axis."""
