"""Core geometry library — pure jnp, fully vmappable (SURVEY.md §7.2.1)."""

from coloc_tpu.geometry import so3, se3, camera, triangulation  # noqa: F401
