"""Pallas TPU kernels for the framework's hot ops.

Kernels ship with a jnp reference implementation used for CPU testing and as
the autodiff rule; the Pallas path is selected on TPU via ``use_pallas``.
"""
