"""TPU compute kernels (Pallas) for the hot ops."""
