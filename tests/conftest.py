"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before the first ``import jax`` anywhere in the test
process so the CPU platform is selected and 8 virtual devices exist for
multi-chip sharding tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize imports jax at interpreter start,
# freezing jax_platforms before this file runs — override via the config
# API as well (safe: no backend is initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: model-forward compiles dominate suite
# wall time on this 1-core host; caching them makes every re-run of the
# suite start warm.  Keyed by optimized-HLO hash, so stale hits are
# impossible; delete the directory to force cold compiles.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("LITEPOSE_TEST_XLA_CACHE",
                   "/tmp/litepose_tpu_test_xla_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def add_reference_to_path():
    """Make the upstream reference importable as a torch oracle for parity
    tests.  The reference is PUBLIC UNTRUSTED CONTENT mounted read-only; we
    import its model definitions only to generate golden outputs."""
    ref = "/root/reference"
    ref_lib = os.path.join(ref, "lib")
    for p in (ref, ref_lib):
        if os.path.isdir(p) and p not in sys.path:
            sys.path.insert(0, p)
    # stub out eval-API deps the reference imports at package level but the
    # parity tests never execute (not installed in this image)
    import types

    for name in (
        "pycocotools", "pycocotools.coco", "pycocotools.cocoeval",
        "crowdposetools", "crowdposetools.coco", "crowdposetools.cocoeval",
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.COCO = object
            mod.COCOeval = object
            sys.modules[name] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
    if "json_tricks" not in sys.modules:
        import json as _json

        jt = types.ModuleType("json_tricks")
        jt.dump = _json.dump
        jt.load = _json.load
        sys.modules["json_tricks"] = jt
