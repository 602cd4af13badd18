"""FID evaluation stack: Flax InceptionV3 feature extractor, activation
statistics (sharded across the device mesh), and Frechet distance."""
