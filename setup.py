import os
from setuptools import setup, Extension

ext_modules = []
if os.environ.get("DIFFERENDER_TPU_NO_NATIVE") != "1":
    ext_modules.append(
        Extension(
            "differender_tpu._voliox",
            sources=["native/voliox.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,   # pure-Python fallback exists (io.py)
        )
    )

setup(ext_modules=ext_modules)
