"""Run logger: reproduces the reference's on-disk output contract.

Parity target: /root/reference/src/eoe/utils/logger.py and README.md:168-247.
A run directory ``log_{YYYYMMDDHHMMSS}_{comment}`` contains:
  print.txt / logtxt.txt / warnings.txt   — text streams
  setup.json                              — full serialized config
  src.tar.gz                              — archive of the framework source (provenance)
  results.json, eval_cls{i}_it{j}_anomaly_scores.json — metrics
  *.pdf                                   — ROC/PRC curves with mean curves
  *.png                                   — preview grids
  snapshots/snapshot_cls{i}_it{j}.msgpack — model+opt+epoch+ds_statistics
  tb/ tensorboard events (default-on)     — scalars/histograms
Continued runs log into ``{old_dir}---CNTD`` (main/__init__.py:299,338).
"""

import json
import os
import os.path as pt
import tarfile
import time
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from typing import List, Optional, Sequence

import numpy as np

from eoe_tpu.ops.metrics import PRC, ROC

# ONE background worker shared by every Logger: a single thread keeps
# same-name writes FIFO, bounds thread count in many-run processes (GA
# searches, test suites), and concurrent.futures' own exit hook joins any
# still-queued writes at interpreter shutdown.
_IO_POOL: Optional[ThreadPoolExecutor] = None


def _io_pool() -> ThreadPoolExecutor:
    global _IO_POOL
    if _IO_POOL is None:
        _IO_POOL = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="eoe-logger-io")
    return _IO_POOL


class JsonEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (set, tuple)):
            return list(o)
        if o is None or isinstance(o, (bool, int, float, str, list, dict)):
            return o
        try:
            import jax
            if isinstance(o, jax.Array):
                return np.asarray(o).tolist()
        except Exception:
            pass
        return repr(o)


def mean_roc(rocs: Sequence[ROC], n_points: int = 200) -> Optional[ROC]:
    """Average multiple ROC curves on a common FPR grid (role of
    logger.py:94-122 mean_plot)."""
    rocs = [r for r in rocs if r is not None]
    if not rocs:
        return None
    grid = np.linspace(0, 1, n_points)
    tprs = [np.interp(grid, r.fpr, r.tpr) for r in rocs]
    mean_tpr = np.mean(tprs, axis=0)
    aucs = [r.auc for r in rocs]
    roc = ROC(tpr=mean_tpr, fpr=grid, thresholds=np.full(n_points, np.nan), auc=float(np.mean(aucs)))
    return roc


class Timer:
    def __init__(self, logger, name):
        self.logger, self.name = logger, name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *a):
        self.logger.print(f"{self.name} took {time.time() - self.t0:.3f}s")


class Tracker:
    """Nested-loop progress tracker with smoothed live metrics (role of the
    reference's tqdm Tracker, logger.py:505-569): ``track([n_outer, n_inner],
    metrics_fns, desc)`` renders `desc outer i/n inner j/m | k=v ...` lines;
    metric values are exponentially smoothed."""

    def __init__(self, logger, totals: Sequence[int], metrics: Optional[dict] = None,
                 desc: str = "", smooth: float = 0.9, print_every: float = 0.5):
        self.logger = logger
        self.totals = list(totals)
        self.counts = [0] * len(totals)
        self.metrics = metrics or {}
        self.desc = desc
        self.smooth = smooth
        self._smoothed = {}
        self._last_print = 0.0
        self.print_every = print_every
        self.n = 0  # total inner updates (scalar-log step counter)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self._render(force=True)

    def update(self, increments: Sequence[int]):
        for i, inc in enumerate(increments):
            self.counts[i] += inc
            if inc and i < len(self.counts) - 1:  # outer tick resets inner counters
                for j in range(i + 1, len(self.counts)):
                    self.counts[j] = 0
        self.n += increments[-1] if increments else 0
        for k, fn in self.metrics.items():
            try:
                v = fn()
            except Exception:
                v = None
            if isinstance(v, (int, float)) and np.isfinite(v):
                prev = self._smoothed.get(k)
                self._smoothed[k] = (v if prev is None
                                     else self.smooth * prev + (1 - self.smooth) * v)
            elif v is not None:
                self._smoothed[k] = v
        self._render()

    def _render(self, force: bool = False):
        now = time.time()
        if not force and now - self._last_print < self.print_every:
            return
        self._last_print = now
        pos = " ".join(f"{c}/{t}" for c, t in zip(self.counts, self.totals))
        mets = " | ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in self._smoothed.items() if v is not None)
        print(f"\r{self.desc} {pos} {('| ' + mets) if mets else ''}",
              end="" if not force else "\n", flush=True)


class Logger:
    def __init__(self, logdir: str, comment: str = "", noname: bool = False, active: bool = True,
                 tensorboard: bool = True, archive_source: bool = True):
        """
        @param logdir: parent directory for run directories. A '---CNTD' suffix
            on an existing directory continues that run (parity:
            main/__init__.py:299,338).
        @param comment: appended to the timestamped run directory name.
        @param noname: use `logdir` directly as the run directory.
        @param active: inactive loggers swallow all output (evolution runs
            deactivate logging after the first individual, evolve/__init__.py:68-69).
        @param tensorboard: default-on like the reference's always-created
            SummaryWriter (logger.py:154-173); degrades silently to the JSON
            scalar record if the tensorboard package is unavailable.
        """
        self.active = active
        self.start = datetime.now()
        if noname:
            self.dir = logdir
        else:
            name = f"log_{self.start.strftime('%Y%m%d%H%M%S')}{'_' + comment if comment else ''}"
            self.dir = pt.join(logdir, name)
        if self.active:
            os.makedirs(self.dir, exist_ok=True)
            os.makedirs(pt.join(self.dir, "snapshots"), exist_ok=True)
        self.comment = comment
        self._scalars = {}
        self.tb_writer = None
        if tensorboard and self.active:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb_writer = SummaryWriter(log_dir=pt.join(self.dir, "tb"))
            except Exception:
                self.tb_writer = None
        self._setup_logged = 0
        # Artifact rendering/serialization (ROC/PRC PDFs, preview PNGs,
        # snapshot msgpack) runs on the shared background worker so the chip
        # trains the next seed/class while the host draws — the dominant term
        # of the warm seed-grid wall-clock is this host I/O (PARITY "seed
        # grid"). drain() (called at the end of Trainer.run / evolve)
        # guarantees the on-disk contract is complete when those return.
        # EOE_TPU_SYNC_IO=1 forces inline writes.
        self._io_pending: list = []
        self._io_sync = os.environ.get("EOE_TPU_SYNC_IO", "") == "1"
        if archive_source and self.active:
            self.log_source_archive()

    # ---------------------------------------------------------- async io

    def _io_submit(self, fn, what: str):
        """Run `fn` on the background I/O worker (inline when sync-forced).
        Exceptions become warnings — artifact rendering never fails a run."""
        def guarded():
            try:
                fn()
            except Exception as e:
                self.warning(f"{what} failed: {e}", print_msg=False)
        if self._io_sync:
            guarded()
            return
        self._io_pending.append(_io_pool().submit(guarded))
        if len(self._io_pending) > 64:  # keep the future list bounded
            self._io_pending = [f for f in self._io_pending if not f.done()]

    def drain(self):
        """Block until every queued artifact write has hit disk."""
        pending, self._io_pending = self._io_pending, []
        for f in pending:
            f.result()

    # ---------------------------------------------------------- text

    def _append(self, fname: str, msg: str):
        if not self.active:
            return
        with open(pt.join(self.dir, fname), "a") as f:
            f.write(msg + "\n")

    def print(self, msg: str, fps: bool = False, err: bool = False):
        print(msg)
        self._append("print.txt", str(msg))

    def logtxt(self, msg: str, print_msg: bool = True):
        if print_msg:
            print(msg)
        self._append("logtxt.txt", str(msg))

    def warning(self, msg: str, print_msg: bool = True):
        if print_msg:
            print(f"WARNING: {msg}")
        self._append("warnings.txt", str(msg))

    def timeit(self, name: str = "") -> Timer:
        return Timer(self, name)

    def track(self, totals: Sequence[int], metrics: Optional[dict] = None,
              desc: str = "") -> "Tracker":
        """Nested progress tracker (role of logger.py:497-503 track())."""
        return Tracker(self, totals, metrics, desc)

    def hist(self, name: str, values, step: int = 0, bins: int = 30):
        """Histogram logging: tensorboard when available, else a compact
        JSON record in scalars.json (role of logger.py:479-491)."""
        if not self.active:
            return
        vals = np.asarray(values, np.float64).reshape(-1)
        vals = vals[np.isfinite(vals)]
        if vals.size == 0:  # tb's make_histogram raises on empty input
            return
        if self.tb_writer is not None:
            self.add_histogram(name, vals, step)
        counts, edges = np.histogram(vals, bins=bins)
        self._scalars.setdefault(f"hist/{name}", []).append(
            (int(step), {"counts": counts.tolist(), "edges": edges.tolist()}))

    # ---------------------------------------------------------- json / setup

    def logjson(self, name: str, d: dict):
        if not self.active:
            return
        with open(pt.join(self.dir, f"{name}.json"), "w") as f:
            json.dump(d, f, indent=2, cls=JsonEncoder)

    def logsetup(self, setup: dict, step: int = 0):
        """setup.json (step 0) and setup_v{n}.json for later additions
        (role of logger.py:342-361)."""
        if not self.active:
            return
        name = "setup" if step == 0 else f"setup_v{step}"
        self.logjson(name, setup)
        self._setup_logged = step

    def log_source_archive(self):
        """Archive the framework source tree for provenance (logger.py:363-378)."""
        try:
            import eoe_tpu
            src_root = pt.dirname(pt.abspath(eoe_tpu.__file__))
            out = pt.join(self.dir, "src.tar.gz")
            if not pt.exists(out):
                with tarfile.open(out, "w:gz") as tar:
                    tar.add(src_root, arcname="eoe_tpu",
                            filter=lambda ti: None if "__pycache__" in ti.name else ti)
        except Exception as e:  # never fail a run over provenance archiving
            self.warning(f"could not archive source: {e}", print_msg=False)

    # ---------------------------------------------------------- scalars

    def add_scalar(self, name: str, value: float, step: int):
        if not self.active:
            return
        self._scalars.setdefault(name, []).append((int(step), float(value)))
        if self.tb_writer is not None:
            self.tb_writer.add_scalar(name, value, step)

    def add_histogram(self, name: str, values, step: int):
        if self.active and self.tb_writer is not None:
            import torch
            self.tb_writer.add_histogram(name, torch.as_tensor(np.asarray(values)), step)

    def flush_scalars(self):
        if not self.active or not self._scalars:
            return
        with open(pt.join(self.dir, "scalars.json"), "w") as f:
            json.dump(self._scalars, f, cls=JsonEncoder)

    # ---------------------------------------------------------- images

    def logimg(self, name: str, images: np.ndarray, nrow: int = 8,
               rowheaders: Optional[List[str]] = None):
        """Save an image grid PNG with optional per-row header captions
        (role of logger.py:202-295). `images` is (n, h, w, c) float [0,1] or
        uint8."""
        if not self.active:
            return
        try:
            from PIL import Image  # noqa: F401 - fail fast on the caller
        except ImportError:
            return
        # uint8-ify NOW (it copies, decoupling from caller-owned buffers),
        # then build+encode the grid on the I/O worker
        imgs = np.asarray(images)
        imgs = (imgs.copy() if imgs.dtype == np.uint8
                else (np.clip(imgs, 0, 1) * 255).astype(np.uint8))
        self._io_submit(lambda: self._render_img(name, imgs, nrow, rowheaders),
                        f"logimg({name})")

    def _render_img(self, name: str, imgs: np.ndarray, nrow: int,
                    rowheaders: Optional[List[str]]):
        from PIL import Image
        n, h, w, c = imgs.shape
        ncol = nrow
        nrows = int(np.ceil(n / ncol))
        header_w = 0
        if rowheaders:
            header_w = max(10 * max(len(str(s)) for s in rowheaders) + 6, 40)
        grid = np.zeros((nrows * (h + 2), header_w + ncol * (w + 2), c), dtype=np.uint8)
        for i in range(n):
            r, col = divmod(i, ncol)
            grid[r * (h + 2) + 1:r * (h + 2) + 1 + h,
                 header_w + col * (w + 2) + 1:header_w + col * (w + 2) + 1 + w] = imgs[i]
        if c == 1:
            grid = grid[..., 0]
        img = Image.fromarray(grid)
        if rowheaders:
            try:
                from PIL import ImageDraw
                if img.mode == "L":
                    img = img.convert("RGB")
                draw = ImageDraw.Draw(img)
                for r, text in enumerate(rowheaders[:nrows]):
                    draw.text((3, r * (h + 2) + max(h // 2 - 5, 0)), str(text),
                              fill=(255, 255, 255))
            except Exception:
                pass
        path = pt.join(self.dir, f"{name}.png")
        os.makedirs(pt.dirname(path), exist_ok=True)
        img.save(path)

    # ---------------------------------------------------------- curves

    def plot_many(self, curves: Sequence, labels: Optional[Sequence[str]] = None,
                  name: str = "roc", step: int = 0):
        """Plot multiple ROC/PRC curves + their mean into a PDF
        (logger.py:416-455); returns the mean curve."""
        curves = list(curves or [])
        kept = [c for c in curves if c is not None]
        if not kept:
            return None
        is_roc = isinstance(kept[0], ROC)
        mean = mean_roc(kept) if is_roc else None
        if self.active:
            labels = list(labels) if labels is not None else None
            path = pt.join(self.dir, f"{name}.pdf")

            def render():
                # object-oriented matplotlib (no pyplot): safe on the I/O
                # worker thread — pyplot's global figure registry is not
                from matplotlib.figure import Figure
                fig = Figure(figsize=(5, 5))
                ax = fig.subplots()
                for i, cur in enumerate(curves):
                    if cur is None:
                        continue
                    lbl = labels[i] if labels is not None and i < len(labels) else None
                    if is_roc:
                        ax.plot(cur.fpr, cur.tpr, alpha=0.4,
                                label=f"{lbl} ({cur.auc * 100:.1f}%)" if lbl else None)
                    else:
                        ax.plot(cur.rec, cur.prec, alpha=0.4,
                                label=f"{lbl} ({cur.avg_prec * 100:.1f}%)" if lbl else None)
                if is_roc and mean is not None and len(kept) > 1:
                    ax.plot(mean.fpr, mean.tpr, "k-", label=f"mean ({mean.auc * 100:.1f}%)")
                ax.set_xlabel("FPR" if is_roc else "Recall")
                ax.set_ylabel("TPR" if is_roc else "Precision")
                if labels is not None or len(kept) > 1:
                    ax.legend(fontsize=6)
                fig.savefig(path, bbox_inches="tight")

            self._io_submit(render, f"plot_many({name})")
        if is_roc:
            # mean curve with the seed-wise AUC std attached (ad_trainer.py:341)
            return _MeanROC(mean.tpr, mean.fpr, mean.thresholds, mean.auc,
                            float(np.std([c.auc for c in kept])))
        else:
            aps = [c.avg_prec for c in kept]
            return _MeanPRC(kept[0].prec, kept[0].rec, kept[0].thresholds,
                            float(np.mean(aps)), float(np.std(aps)))

    # ---------------------------------------------------------- snapshots

    def snapshot_path(self, name: str) -> str:
        return pt.join(self.dir, "snapshots", f"{name}.msgpack")

    def snapshot(self, name: str, payload: dict) -> str:
        """Serialize {'params', 'batch_stats', 'opt_state', 'epoch',
        'ds_statistics', ...} (role of logger.py:318-340). The msgpack
        encode + write happens on the I/O worker (the payload's host arrays
        must not be mutated afterwards — the trainer fetches fresh copies);
        the returned path is valid once ``drain()`` has run."""
        if not self.active:
            return ""
        path = self.snapshot_path(name)

        def write():
            from flax import serialization
            os.makedirs(pt.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(serialization.msgpack_serialize(payload))

        self._io_submit(write, f"snapshot({name})")
        return path


class _MeanROC(ROC):
    """ROC with seed-wise std attached."""
    def __new__(cls, tpr, fpr, thresholds, auc, std=0.0):
        self = super().__new__(cls, tpr, fpr, thresholds, auc)
        return self

    def __init__(self, tpr, fpr, thresholds, auc, std=0.0):
        self.std = std


class _MeanPRC(PRC):
    def __new__(cls, prec, rec, thresholds, avg_prec, std=0.0):
        self = super().__new__(cls, prec, rec, thresholds, avg_prec)
        return self

    def __init__(self, prec, rec, thresholds, avg_prec, std=0.0):
        self.std = std
