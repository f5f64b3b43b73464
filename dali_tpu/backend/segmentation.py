"""Segmentation operators — populated later; reference ``dali/operators/segmentation/``."""
