"""Datasets and input pipelines (host-side numpy; devices see jnp arrays).

``get_dataset(name, data_dir)`` mirrors the reference loader surface
(/root/reference/loader/__init__.py:1-29).
"""
from dxmi_tpu.data.cifar10 import CIFAR10, get_dataset  # noqa: F401
