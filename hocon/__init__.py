"""hocon — TPU-native hand-object reconstruction framework.

A brand-new JAX/Flax/Pallas framework with the capabilities of the PyTorch
reference ``hassony2/handobjectconsist`` (CVPR 2020, "Leveraging Photometric
Consistency over Time for Sparsely Supervised Hand-Object Reconstruction").

Layer map (see SURVEY.md for the reference analysis this is built to):

- ``hocon.geometry`` — rotation utils, MANO differentiable hand model,
  camera projection (reference: external ``manopth`` + ``meshreg/models/project.py``).
- ``hocon.render``   — differentiable soft rasterizer (pure-JAX reference +
  Pallas TPU kernel), SSIM, frame-pair photometric warp
  (reference: external ``neural_renderer`` CUDA + warp module).
- ``hocon.models``   — Flax ResNet trunk, MANO/object/absolute heads, HOCNet
  (reference: ``meshreg/models/meshregnet.py`` et al).
- ``hocon.data``     — query system, FPHAB / HO-3D parsers, crop/augment,
  frame-pair sampling, batching pipeline (reference: ``meshreg/datasets/``).
- ``hocon.train``    — sharded train step (pjit over a device mesh), Orbax
  checkpointing, metrics (reference: ``meshreg/netscripts/``).
- ``hocon.evaluation`` — Zimmermann-style PCK/AUC EvalUtil, CodaLab dump
  (reference: ``meshreg/evaluation/zimeval.py``).
- ``hocon.cli``      — train / trainwarp / evaluate entry points
  (reference: ``trainmeshreg.py`` / ``trainmeshwarp.py``).
"""

__version__ = "0.1.0"
