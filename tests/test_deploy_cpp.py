"""End-to-end native deploy path: export a tiny detection-shaped model with
jax.export, build the C++ inference host (tools/deploy/jtsm_infer.cpp,
reference parity: tools/deploy/caffe2_mask_rcnn.cpp), run the binary, and
check it reports latency + detections. Skipped when no C++ toolchain."""

import os
import shutil
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEPLOY = os.path.join(ROOT, "tools", "deploy")


@pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="no C++ toolchain",
)
def test_cpp_inference_host(tmp_path):
    import flax.linen as nn

    from jtsm_tpu.config import get_cfg
    from jtsm_tpu.export.api import TPUTracer

    class TinyDet(nn.Module):
        """Minimal model with the detection output contract the host prints."""

        @nn.compact
        def __call__(self, batch, train=False):
            x = nn.Conv(4, (3, 3), name="conv")(batch["image"])
            pooled = x.mean(axis=(1, 2))  # (B, 4)
            b = pooled.shape[0]
            scores = jax.nn.sigmoid(nn.Dense(8, name="cls")(pooled))  # (B, 8)
            boxes = jnp.abs(nn.Dense(32, name="box")(pooled)).reshape(b, 8, 4)
            return {
                "boxes": boxes,
                "scores": scores,
                "classes": jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (b, 1)),
                "valid": scores > 0.0,
            }

    model = TinyDet()
    batch = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "image_sizes": jnp.asarray([[32, 32]], jnp.int32),
        "orig_sizes": jnp.asarray([[32, 32]], jnp.int32),
    }
    variables = model.init(jax.random.key(0), batch)
    tracer = TPUTracer(get_cfg(), model, variables, batch)
    artifact = str(tmp_path / "model.jax")
    tracer.export_jax_exported(artifact)

    build = str(tmp_path / "build")
    subprocess.run(
        ["cmake", "-B", build, "-S", DEPLOY, f"-DPython3_EXECUTABLE={sys.executable}"],
        check=True,
        capture_output=True,
    )
    subprocess.run(["cmake", "--build", build], check=True, capture_output=True)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)
    out = subprocess.run(
        [os.path.join(build, "jtsm_infer"), artifact, "--iters", "2"],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "latency:" in out.stdout
    assert "detections:" in out.stdout
