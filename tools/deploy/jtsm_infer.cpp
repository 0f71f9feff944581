// C++ inference host for exported jtsm_tpu models.
//
// Reference parity: tools/deploy/{caffe2_mask_rcnn,torchscript_traced_mask_rcnn}.cpp
// — C++ binaries that load an exported artifact and run detection. Here the
// artifact is a jax.export blob (tools/deploy/export_model.py --format jax):
// a versioned StableHLO program plus calling convention. The portable way to
// execute it from a C++ application without linking all of TF/XLA is to embed
// the CPython runtime and drive the JAX PJRT client through it — the C++
// side owns the process, I/O and latency loop; XLA does the compute.
//
// Build:   see CMakeLists.txt  (needs libpython3; no torch/TF linkage)
// Run:     ./jtsm_infer model.jax [image.ppm] [--iters N]
//          with no image, a random input of the exported shape is used.

#include <Python.h>

#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>

namespace {

// Bootstrap executed inside the embedded interpreter. Deserializes the
// artifact once; exposes run(image_path_or_empty, iters).
const char* kBootstrap = R"PY(
import numpy as np, time

import jax
from jax import export as jax_export


def _load(path):
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


_exported = None


def setup(path):
    global _exported
    _exported = _load(path)
    # in_avals: (variables_tree, batch_tree); find the image aval
    return str(_exported.in_avals)


def _example_batch(image_path):
    # weights are baked into the artifact (export_model.py closes over
    # them); the calling convention is a single batch tree
    args, _kwargs = jax.tree_util.tree_unflatten(
        _exported.in_tree, list(_exported.in_avals)
    )
    (batch_aval,) = args
    b, h, w, _ = batch_aval["image"].shape
    if image_path:
        from PIL import Image

        im = np.asarray(
            Image.open(image_path).convert("RGB").resize((w, h)), np.float32
        )
        image = np.tile(im[None], (b, 1, 1, 1))
    else:
        image = np.random.RandomState(0).rand(b, h, w, 3).astype(np.float32) * 255
    return {
        "image": image,
        "image_sizes": np.tile(np.int32([[h, w]]), (b, 1)),
        "orig_sizes": np.tile(np.int32([[h, w]]), (b, 1)),
    }


def run(image_path, iters):
    batch = _example_batch(image_path or None)
    fn = jax.jit(_exported.call)
    out = jax.block_until_ready(fn(batch))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(batch))
    dt = (time.perf_counter() - t0) / max(iters, 1)
    lines = [f"latency: {dt * 1e3:.2f} ms/batch"]
    if isinstance(out, dict) and "scores" in out:
        valid = np.asarray(out["valid"][0])
        scores = np.asarray(out["scores"][0])[valid]
        boxes = np.asarray(out["boxes"][0])[valid]
        classes = np.asarray(out["classes"][0])[valid]
        order = np.argsort(-scores)[:5]
        lines.append(f"detections: {int(valid.sum())}")
        for i in order:
            lines.append(
                f"  cls={int(classes[i])} score={scores[i]:.3f} "
                f"box=({boxes[i][0]:.0f},{boxes[i][1]:.0f},{boxes[i][2]:.0f},{boxes[i][3]:.0f})"
            )
    return "\n".join(lines)
)PY";

PyObject* GetFn(PyObject* mod, const char* name) {
  PyObject* fn = PyObject_GetAttrString(mod, name);
  if (!fn || !PyCallable_Check(fn)) {
    PyErr_Print();
    std::fprintf(stderr, "bootstrap function %s missing\n", name);
    std::exit(2);
  }
  return fn;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s model.jax [image] [--iters N]\n", argv[0]);
    return 1;
  }
  const char* model_path = argv[1];
  std::string image_path;
  long iters = 10;
  for (int i = 2; i < argc; ++i) {
    if (std::strcmp(argv[i], "--iters") == 0 && i + 1 < argc) {
      iters = std::strtol(argv[++i], nullptr, 10);
    } else {
      image_path = argv[i];
    }
  }

  Py_Initialize();

  PyObject* main_mod = PyImport_AddModule("__main__");
  if (PyRun_SimpleString(kBootstrap) != 0) {
    std::fprintf(stderr, "bootstrap failed (is jax importable?)\n");
    return 2;
  }

  PyObject* setup = GetFn(main_mod, "setup");
  PyObject* avals = PyObject_CallFunction(setup, "s", model_path);
  if (!avals) {
    PyErr_Print();
    return 2;
  }
  std::printf("loaded %s\n  signature: %.120s...\n", model_path,
              PyUnicode_AsUTF8(avals));
  Py_DECREF(avals);
  Py_DECREF(setup);

  PyObject* run = GetFn(main_mod, "run");
  auto t0 = std::chrono::steady_clock::now();
  PyObject* result =
      PyObject_CallFunction(run, "sl", image_path.c_str(), iters);
  if (!result) {
    PyErr_Print();
    return 2;
  }
  auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0);
  std::printf("%s\n", PyUnicode_AsUTF8(result));
  std::printf("total wall (compile + %ld iters): %.2f s\n", iters, dt.count());
  Py_DECREF(result);
  Py_DECREF(run);

  Py_Finalize();
  return 0;
}
