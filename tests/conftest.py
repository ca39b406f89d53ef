import os
import subprocess
import sys
from pathlib import Path

# Device tests run on a virtual 8-device CPU mesh; set before jax import.
# (This environment force-prepends an 'axon' TPU platform via JAX_PLATFORMS,
# so the env var alone is not enough — override the config directly.)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_BUILD = REPO / "build" / "ref"


@pytest.fixture(scope="session")
def ref_bgt():
    """Path to the reference bgt binary (built from /root/reference sources)."""
    exe = REF_BUILD / "bgt"
    if not exe.exists():
        subprocess.run(["sh", str(REPO / "tools" / "build_reference.sh")], check=True)
    return str(exe)


@pytest.fixture(scope="session")
def ref_pbfview():
    exe = REF_BUILD / "pbfview"
    if not exe.exists():
        subprocess.run(["sh", str(REPO / "tools" / "build_reference.sh")], check=True)
    return str(exe)


@pytest.fixture(scope="session")
def ref_kexpr():
    exe = REF_BUILD / "kexpr"
    if not exe.exists():
        subprocess.run(["sh", str(REPO / "tools" / "build_reference.sh")], check=True)
    return str(exe)
