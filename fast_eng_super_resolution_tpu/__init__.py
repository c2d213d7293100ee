"""fast_eng_super_resolution_tpu — TPU-native adaptive-domain-decomposition
super-resolution framework for engineering CFD fields on 3D unstructured meshes.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
cmudrc/fast-eng-super-resolution (reference mounted at /root/reference):

- ``core``     : fixed-shape padded subdomain graph batches (pytrees), config,
                 checkpointing (native npz + torch ``.pth`` importer).
- ``ops``      : message passing (MXU-factored edge-conditioned convolution),
                 segment ops, losses, interpolation kernels.
- ``models``   : KernelNN ("neuralop"), TEECNet, FNO2d, DeepONet, GraphSAGE.
- ``parallel`` : device-mesh sharding, pjit train/predict steps, expert dispatch.
- ``data``     : Fluent .msh / CFF .cas.h5 tensorizer, RCB partitioner with
                 overlap, VTU XML IO (no VTK dependency), synthetic duct meshes.
- ``physics``  : divergence-free projection (preconditioned CG), wall shear
                 stress post-pass — all on device.
- ``sched``    : PCA/spectrum/VAE encoders, k-means/GMM/Wasserstein
                 classifiers, the partition scheduler.

Reference parity notes cite file:line in /root/reference throughout.
"""

__version__ = "0.1.0"
