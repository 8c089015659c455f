"""Engine operators: spatial join, sampling, composites, kNN, dedup, text."""
