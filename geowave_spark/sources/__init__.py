"""Data sources: driver testdata loaders + geo-derived views, the
deterministic synthetic image table, and the minimal PNG codec."""
