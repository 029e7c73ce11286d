"""TPU-native face reenactment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
"Finding Directions in GAN's Latent Space for Neural Face Reenactment"
(BMVC 2022; reference implementation: StelaBou/stylegan_directions_face_reenactment).

Design notes (TPU-first, not a port):
  * NHWC layout everywhere; torch NCHW checkpoints are transposed at the
    conversion boundary (`weights/torch_convert.py`).
  * All models are pure functions over parameter pytrees — no module objects
    on the compute path, so everything composes under `jax.jit` / `pjit`.
  * The hot resampling / activation primitives live in `ops/` with both an
    XLA formulation (`lax.conv_general_dilated`) and Pallas TPU kernels.
  * Multi-device scaling is data-parallel over a `jax.sharding.Mesh`
    (`parallel/`), replacing the reference's single hard-coded CUDA device.
"""

__version__ = "0.1.0"
