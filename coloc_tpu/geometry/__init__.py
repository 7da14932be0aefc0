"""Core geometry library — pure jnp, fully vmappable (SURVEY.md §7.2.1)."""

from coloc_tpu.geometry import (  # noqa: F401
    camera,
    essential,
    homography,
    p3p,
    se3,
    so3,
    triangulation,
)
