"""Scalar function library: st_* geometry functions + converter expressions."""

from geomesa_ray.functions import st_functions  # noqa: F401
