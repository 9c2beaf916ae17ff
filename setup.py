from setuptools import find_packages, setup

exec(open("mustache_tpu/_version.py").read())

setup(
    name="mustache-tpu",
    version=__version__,  # noqa: F821
    description=(
        "TPU-native multi-scale chromatin loop detection for Hi-C and "
        "Micro-C contact maps (scale-space DoG method, JAX/XLA/Pallas)"
    ),
    packages=find_packages(exclude=["tests"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "pandas", "h5py"],
    entry_points={
        "console_scripts": [
            "mustache-tpu = mustache_tpu.cli:main",
            "diff-mustache-tpu = mustache_tpu.diff_cli:main",
        ]
    },
)
