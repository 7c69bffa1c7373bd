"""Package setup (mirror of the reference's setup.py surface, minus the CUDA
extension builds — kernels here are JAX/XLA/Pallas programs, not compiled
extensions)."""

from setuptools import find_packages, setup

setup(
    name="findnpropagate_tpu",
    version="0.1.0",
    description=(
        "TPU-native open-vocabulary 3D object detection (JAX/XLA/Pallas) — "
        "Find n' Propagate capabilities, redesigned TPU-first"
    ),
    packages=find_packages(exclude=["tests", "tools"]),
    python_requires=">=3.10",
    install_requires=[
        "jax",
        "flax",
        "optax",
        "orbax-checkpoint",
        "numpy",
        "pyyaml",
    ],
)
