"""Core framework: PRNG contract, data pipeline, mesh, checkpointing, trainer."""
