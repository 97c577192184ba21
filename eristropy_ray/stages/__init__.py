"""Ray Data stage functions: vectorized Arrow batch/group transforms."""
