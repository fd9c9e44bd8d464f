"""Misc utilities: PyTorch checkpoint import for weight parity."""
