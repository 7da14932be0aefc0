"""Mapping & localization layer (reference L6: Reconstructor / Localizer /
Refiner). Submodules are imported directly (coloc_tpu.sfm.ba etc.)."""
