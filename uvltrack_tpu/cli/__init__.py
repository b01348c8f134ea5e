"""CLI entry points: train / test / analyze / profile / demo / pack /
parity / setup_env. Each is runnable as `python -m uvltrack_tpu.cli.<name>`."""
