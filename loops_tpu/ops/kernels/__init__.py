"""Pallas (Mosaic) TPU kernels — the native compute tier."""
