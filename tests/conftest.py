"""Test bootstrap: force an 8-device virtual CPU mesh so sharding/collective
tests run without TPU hardware (SURVEY §7 test strategy)."""

import os
import sys

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# XLA CPU's default matmul precision goes through a reduced-precision oneDNN
# path (~1e-3 rel error) — force true fp32 so parity tests compare math, not
# backend quirks. TPU runs keep the default (bf16 MXU) for speed.
import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
# the axon TPU plugin overrides the JAX_PLATFORMS env var — force CPU here so
# the virtual 8-device mesh (xla_force_host_platform_device_count) is in effect
jax.config.update("jax_platforms", "cpu")


def load_reference_module(relpath, name=None):
    """Import a module file from /root/reference by path, with stubs for its
    CUDA-only deps (torchvision, decord) so pure-math oracles are importable.

    Used ONLY as a test oracle — reference code never ships in the package.
    """
    import importlib.util
    import types

    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        # transformers probes torchvision.__spec__; a bare ModuleType has None
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
        tv.__version__ = "0.21.0"
        tv.io = types.ModuleType("torchvision.io")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
        tv.transforms.InterpolationMode = type("InterpolationMode", (), {"BICUBIC": "bicubic"})
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.io"] = tv.io
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional

    path = os.path.join("/root/reference", relpath)
    modname = name or ("ref_" + relpath.replace("/", "_").removesuffix(".py"))
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
