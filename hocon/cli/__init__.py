"""CLI entry points (reference L6: trainmeshreg.py / trainmeshwarp.py /
evalmeshreg.py at the repo root)."""
