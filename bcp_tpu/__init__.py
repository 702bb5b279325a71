"""bcp_tpu — TPU-native framework for Bidirectional Copy-Paste semi-supervised
medical image segmentation (CVPR 2023).

A ground-up JAX/XLA/pjit re-design of the capabilities of the reference
PyTorch repo (DeepMed-Lab-ECNU/BCP):

- ``bcp_tpu.ops``      pure jittable algorithm kernels (masks, mixing, losses,
                       EMA, ramps, on-device connected components).
- ``bcp_tpu.models``   flax.linen segmentation nets (VNet3D, UNet2D) in
                       channels-last layout for the MXU.
- ``bcp_tpu.data``     host-side HDF5 pipelines, augmentations, two-stream
                       semi-supervised batch composition, device prefetch.
- ``bcp_tpu.train``    the generic two-stage (pre-train -> self-train) BCP
                       mean-teacher trainer; every step is one XLA program.
- ``bcp_tpu.eval``     device-batched sliding-window 3D inference, 2D
                       per-slice inference, and surface-distance metrics.
- ``bcp_tpu.parallel`` jax.sharding mesh helpers for data-parallel scaling.

The whole self-train update — cuboid mask sampling, bidirectional mixing,
teacher pseudo-labelling (incl. largest-connected-component NMS), two student
forwards, masked Dice+CE, SGD-momentum update and the EMA teacher update —
compiles to a single jitted device program (the reference round-trips to the
CPU for NMS every step; here it stays resident on TPU).
"""

__version__ = "0.1.0"
