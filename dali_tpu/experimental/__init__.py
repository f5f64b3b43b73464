"""Experimental APIs (reference ``nvidia.dali.experimental``)."""

from . import dynamic  # noqa: F401
