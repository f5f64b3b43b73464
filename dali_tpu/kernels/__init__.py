"""Device-side compute kernels (JAX/XLA + Pallas).

TPU-native analogue of ``dali/kernels/`` — but where DALI hand-writes CUDA batch
kernels with block setup over ragged batches (``kernels/common/block_setup.h``),
here each kernel is a jittable function over a padded batch + per-sample extents;
XLA fuses chains of them into the single device program, and the hottest ones have
Pallas implementations.
"""
