"""Input-pipeline throughput: can the host feed the TPU train step?

The round-3 training benchmarks put the b64 LDM step at ~0.1 s and the
VAE-GAN 512px step at ~0.25 s on one chip — the host must deliver
64 latents (resp. 8 512px images) per step-time or the accelerator
starves. This harness measures, on synthetic JPEGs:

  1. cold preprocess (decode -> resize -> pad -> cache), native C++
     batch API vs PIL fallback  [imgs/s]
  2. warm BatchLoader iteration (cached .npy reads -> stack ->
     device_put)  [imgs/s]

and prints the demand line for comparison. Run:
    python benchmarks/loader_bench.py [n_images] [size]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from PIL import Image

    root = tempfile.mkdtemp(prefix="loader_bench_")
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = (rng.rand(512, 448, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"),
                                  quality=92)

    from ldm_image_generator_tpu.data.dataset import ImageDataset

    def emit(metric, value, unit, note=None):
        line = {"metric": metric, "value": round(value, 2), "unit": unit}
        if note:
            line["note"] = note
        print(json.dumps(line), flush=True)

    # -- cold preprocess: native vs PIL --------------------------------
    from ldm_image_generator_tpu.data import native_loader

    real_batch = native_loader.preprocess_batch_native
    real_single = native_loader.preprocess_image_native
    for use_native, name in ((True, "native"), (False, "pil")):
        cache = os.path.join(root, f"cache_{name}")
        if not use_native:  # force the PIL fallback path
            native_loader.preprocess_batch_native = (
                lambda *a, **k: None)
            native_loader.preprocess_image_native = (
                lambda *a, **k: None)
        try:
            t0 = time.perf_counter()
            ImageDataset([img_dir], cache_dir=cache, size=size)
            dt = time.perf_counter() - t0
        finally:
            native_loader.preprocess_batch_native = real_batch
            native_loader.preprocess_image_native = real_single
        emit(f"preprocess_cold_{name}_{size}px", n / dt, "imgs/s")

    # -- warm loader: cached reads -> batch -> device -----------------
    from ldm_image_generator_tpu.data.loader import BatchLoader

    ds = ImageDataset([img_dir],
                      cache_dir=os.path.join(root, "cache_native"),
                      size=size)
    bs = 64 if n >= 64 else n
    loader = BatchLoader(ds, batch_size=bs, shuffle=True, seed=0)
    for _ in loader:  # warm OS page cache
        pass
    t0 = time.perf_counter()
    epochs = 3
    cnt = 0
    for _ in range(epochs):
        for batch in loader:
            cnt += batch.shape[0] if hasattr(batch, "shape") else bs
    dt = time.perf_counter() - t0
    emit(f"loader_warm_b{bs}_{size}px", cnt / dt, "imgs/s",
         note="demand: b64 LDM step ~0.1s => 640 imgs/s; "
              "VAE-GAN 512px step ~0.25s => 32 imgs/s")

    shutil.rmtree(root)


if __name__ == "__main__":
    main()
