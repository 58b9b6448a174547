from setuptools import find_packages, setup

setup(
    name="mbe-tpu",
    version="0.1.0",
    description=("TPU-native massively-batched IMBE/AMBE vocoder decode "
                 "framework (JAX/XLA)"),
    packages=find_packages(include=["mbe_tpu", "mbe_tpu.*"]),
    package_data={"mbe_tpu": ["data/*.npz", "data/*.so"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
)
