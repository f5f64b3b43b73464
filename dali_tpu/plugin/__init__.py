"""Framework integration plugins (reference ``dali/python/nvidia/dali/plugin/``).

For dali_tpu the JAX integration is not a plugin but the native front door —
kept under ``plugin.jax`` for API parity with the reference.
"""
