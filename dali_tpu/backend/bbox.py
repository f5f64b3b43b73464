"""Bounding-box / detection operators — populated in the detection milestone;
reference ``dali/operators/bbox/``, ``dali/operators/ssd/``."""
