"""Data/spatial parallel wrappers over the device mesh."""
