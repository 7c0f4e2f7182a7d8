"""Pure-numpy kernels (cells, geometry) and their Arrow/pandas-UDF wrappers."""
