"""swapnet_tpu — a TPU-native (JAX/Flax/Pallas/pjit) virtual try-on framework.

A ground-up rebuild of the capabilities of andrewjong/SwapNet (Raj et al.,
ECCV 2018): a two-stage GAN pipeline for image-based garment transfer.

Stage 1 ("warp")    deforms a source garment segmentation to a target pose.
Stage 2 ("texture") renders a photorealistic image from the warped cloth
                    segmentation plus ROI-pooled texture features.

Design notes (TPU-first, not a port):
  * All tensors are NHWC (channels-last maps onto the TPU lane dimension).
  * Models are pure Flax modules; training steps are single fused XLA
    programs (D update + G update) with donated state buffers.
  * ROI-Align is formulated as separable bilinear interpolation matmuls
    that run on the MXU instead of gather loops (swapnet_tpu.ops.roi_align).
  * Data parallelism uses a named `jax.sharding.Mesh` with batch-sharded
    inputs and replicated parameters (swapnet_tpu.parallel).
"""

__version__ = "0.1.0"
