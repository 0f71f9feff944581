#!/usr/bin/env python
"""ImageNet classification pretraining for the WS-ResNet backbones.

Reference: projects/WSL/tools/imagenet.py (a torch DDP ImageNet trainer for
the DRN-WSOD ResNet-WS family). TPU-native rewrite: one jitted train step
over a `jax.sharding.Mesh` data axis (XLA inserts the gradient all-reduce),
bf16 compute / f32 params, SGD momentum + warmup-cosine, host-side threaded
JPEG pipeline. The resulting checkpoint loads as `MODEL.WEIGHTS` for the
WSOD configs (backbone subtree).

  python imagenet.py --data /path/imagenet --arch ws_resnet18 --epochs 90
  python imagenet.py --dry-run        # synthetic smoke test, no dataset
"""

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import flax.linen as nn
from jtsm_tpu.checkpoint import DetectionCheckpointer
from jtsm_tpu.modeling.backbone.resnet import ResNet
from jtsm_tpu.parallel.mesh import batch_sharding, build_mesh, replicated
from jtsm_tpu.wsl.modeling.resnet_wsl import WSLResNet

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255

# ws_* = WS max-pool stem (DRN-WSOD family); plain = standard conv stem
ARCH_DEPTH = {"ws_resnet18": 18, "ws_resnet34": 34, "ws_resnet50": 50,
              "ws_resnet101": 101,
              "resnet18": 18, "resnet34": 34, "resnet50": 50,
              "resnet101": 101}


class WSClassifier(nn.Module):
    depth: int = 18
    num_classes: int = 1000
    ws_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        backbone = (WSLResNet if self.ws_stem else ResNet)(
            depth=self.depth,
            out_features=("res5",),
            norm="BN",
            freeze_at=0,
            dtype=jnp.bfloat16,
        )
        feats = backbone(x)["res5"]
        pooled = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(pooled)


def list_image_folder(root):
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    samples = []
    for label, cls in enumerate(classes):
        d = os.path.join(root, cls)
        for f in sorted(os.listdir(d)):
            if f.lower().endswith((".jpg", ".jpeg", ".png")):
                samples.append((os.path.join(d, f), label))
    return samples, classes


def _load_train(path, rng, size=224):
    from PIL import Image

    im = Image.open(path).convert("RGB")
    w, h = im.size
    # RandomResizedCrop(0.08-1.0 area, 3/4-4/3 aspect)
    for _ in range(10):
        area = w * h * rng.uniform(0.08, 1.0)
        ar = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
        cw, ch = int(round(np.sqrt(area * ar))), int(round(np.sqrt(area / ar)))
        if cw <= w and ch <= h:
            x0, y0 = rng.randint(0, w - cw + 1), rng.randint(0, h - ch + 1)
            im = im.crop((x0, y0, x0 + cw, y0 + ch))
            break
    im = im.resize((size, size), Image.BILINEAR)
    arr = np.asarray(im, np.float32)
    if rng.rand() < 0.5:
        arr = arr[:, ::-1]
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def _load_eval(path, size=224):
    from PIL import Image

    im = Image.open(path).convert("RGB")
    w, h = im.size
    scale = 256 / min(w, h)
    im = im.resize((int(w * scale), int(h * scale)), Image.BILINEAR)
    w, h = im.size
    x0, y0 = (w - size) // 2, (h - size) // 2
    arr = np.asarray(im.crop((x0, y0, x0 + size, y0 + size)), np.float32)
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def batches(samples, batch_size, train, seed, workers=16):
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(samples)) if train else np.arange(len(samples))
    pool = ThreadPoolExecutor(workers)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[i : i + batch_size]
        if train:
            seeds = rng.randint(0, 2**31, len(idx))
            imgs = list(
                pool.map(
                    lambda t: _load_train(samples[t[0]][0], np.random.RandomState(t[1])),
                    zip(idx, seeds),
                )
            )
        else:
            imgs = list(pool.map(lambda j: _load_eval(samples[j][0]), idx))
        labels = np.array([samples[j][1] for j in idx], np.int32)
        yield np.stack(imgs), labels


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="datasets/imagenet")
    ap.add_argument("--arch", default="ws_resnet18", choices=sorted(ARCH_DEPTH))
    ap.add_argument("--epochs", type=int, default=90)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--warmup-epochs", type=int, default=5)
    ap.add_argument("--output", default="output/imagenet")
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--print-freq", type=int, default=50)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data smoke test (2 tiny classes)")
    args = ap.parse_args()

    if args.dry_run:
        num_classes, steps_per_epoch = 4, 4
        args.epochs, args.batch_size = 1, 8

        def train_iter(epoch):
            rng = np.random.RandomState(epoch)
            for _ in range(steps_per_epoch):
                yield (rng.rand(args.batch_size, 64, 64, 3).astype(np.float32),
                       rng.randint(0, num_classes, args.batch_size).astype(np.int32))

        val_iter = partial(train_iter, 999)
    else:
        train_samples, classes = list_image_folder(os.path.join(args.data, "train"))
        val_samples, _ = list_image_folder(os.path.join(args.data, "val"))
        num_classes = len(classes)
        steps_per_epoch = len(train_samples) // args.batch_size
        train_iter = lambda epoch: batches(
            train_samples, args.batch_size, True, epoch, args.workers
        )
        val_iter = lambda: batches(val_samples, args.batch_size, False, 0, args.workers)

    model = WSClassifier(
        depth=ARCH_DEPTH[args.arch],
        num_classes=num_classes,
        ws_stem=args.arch.startswith("ws_"),
    )
    sample = next(iter(train_iter(0)))[0][:1]
    variables = model.init(jax.random.key(0), jnp.asarray(sample), train=True)

    total_steps = steps_per_epoch * args.epochs
    warmup_steps = min(args.warmup_epochs * steps_per_epoch, max(total_steps // 2, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    tx = optax.chain(
        optax.add_decayed_weights(args.wd),
        optax.sgd(schedule, momentum=args.momentum, nesterov=False),
    )
    opt_state = tx.init(variables["params"])

    mesh = build_mesh()
    bsh, rep = batch_sharding(mesh), replicated(mesh)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(variables, opt_state, images, labels):
        def loss_fn(params):
            logits, new_vars = model.apply(
                {**variables, "params": params}, images, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, (acc, new_vars)

        (loss, (acc, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(variables["params"])
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {**new_vars, "params": params}, opt_state, loss, acc

    @jax.jit
    def eval_step(variables, images, labels):
        logits = model.apply(variables, images, train=False)
        top1 = (logits.argmax(-1) == labels).mean()
        top5 = (jnp.argsort(-logits, axis=-1)[:, :5] == labels[:, None]).any(-1).mean()
        return top1, top5

    checkpointer = DetectionCheckpointer(variables, save_dir=args.output,
                                         opt_state=opt_state)
    start_epoch = 0
    if args.resume and checkpointer.has_checkpoint():
        loaded = checkpointer.resume_or_load("", resume=True)
        variables = checkpointer.variables
        start_epoch = int(loaded.get("epoch", 0))

    def evaluate():
        t1s, t5s = [], []
        for images, labels in val_iter():
            t1, t5 = eval_step(
                variables,
                jax.device_put(jnp.asarray(images), bsh),
                jax.device_put(jnp.asarray(labels), bsh),
            )
            t1s.append(float(t1)); t5s.append(float(t5))
        print(f"* top1 {np.mean(t1s):.4f} top5 {np.mean(t5s):.4f}")
        return float(np.mean(t1s))

    if args.eval_only:
        evaluate()
        return

    variables = jax.device_put(variables, rep)
    opt_state = jax.device_put(opt_state, rep)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for step, (images, labels) in enumerate(train_iter(epoch)):
            variables, opt_state, loss, acc = train_step(
                variables, opt_state,
                jax.device_put(jnp.asarray(images), bsh),
                jax.device_put(jnp.asarray(labels), bsh),
            )
            if step % args.print_freq == 0:
                ips = args.batch_size * (step + 1) / (time.time() - t0)
                print(
                    f"epoch {epoch} [{step}/{steps_per_epoch}] "
                    f"loss {float(loss):.4f} acc {float(acc):.4f} {ips:.1f} img/s"
                )
        checkpointer.variables = variables
        checkpointer.checkpointables["opt_state"] = opt_state
        checkpointer.save(f"model_{epoch:04d}", epoch=epoch + 1)
        evaluate()
    print("done")


if __name__ == "__main__":
    main()
