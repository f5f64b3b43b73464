"""Sequence operators — populated later; reference ``dali/operators/sequence/``."""
