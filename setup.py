"""Build script for the native extension (_fastdata).

The pure-Python package installs via pyproject.toml alone; this setup.py
adds the optional C extension for host-side batch assembly.  If no C
toolchain is present the extension is skipped and the numpy path is used.
"""

import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "vqvaehmm_tpu._fastdata",
            sources=["native/fastdata.c"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3"],
            optional=True,
        )
    ]
)
