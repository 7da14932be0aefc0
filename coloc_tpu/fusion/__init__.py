"""State estimation & fusion (reference L7: KalmanFilter / CovIntersection)."""
