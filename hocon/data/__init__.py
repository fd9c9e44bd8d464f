"""Data layer (reference L4: meshreg/datasets/).

Host-side numpy/cv2 pipeline producing fixed-shape, TPU-ready batches:
query system, FPHAB / HO-3D annotation parsers, ROI crop + affine/color
augmentation, temporal frame-pair sampling with sparse-supervision
fraction masks, and a batching pipeline with per-host sharding.
"""

from hocon.data.queries import BaseQueries, TransQueries
from hocon.data.hand_dataset import HandDataset
from hocon.data.pipeline import BatchLoader
