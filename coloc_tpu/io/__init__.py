"""Host-side IO: dataset ingest, calibration, logging (reference L2/L9)."""
