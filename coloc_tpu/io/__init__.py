"""Host-side IO: dataset ingest, calibration, logging (reference L2/L9)."""

import numpy as np


def decimate_map_points(X, valid=None, max_points: int = 4096) -> np.ndarray:
    """Shared landmark-cloud policy for the viz/telemetry sinks (LiveViz and
    TransportPublisher): mask invalid landmarks, then stride-decimate to at
    most ~max_points so one publish stays small."""
    X = np.asarray(X)
    if valid is not None:
        X = X[np.asarray(valid)]
    if len(X) > max_points:
        X = X[:: len(X) // max_points + 1]
    return X
