"""Qualitative visualization (reference: meshreg/visualize/)."""

from hocon.visualize.samplevis import sample_vis
