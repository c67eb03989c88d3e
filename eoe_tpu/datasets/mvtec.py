"""MVTec-AD: 15 object/texture classes with per-class ground-truth defects.

Parity target: /root/reference/src/eoe/datasets/mvtec.py —
  * raw data is preprocessed ONCE into a single resized array blob
    ``admvtec_{h}x{w}.npz`` (the reference's .pt blob, :194-256); later runs
    load the blob directly and are fully device-residentable,
  * the train split contains only 'good' samples and is enlarged 10x
    (:160-162),
  * test binary labels come from the per-class DEFECT label ('good' ->
    nominal, any defect -> anomalous), not from the object class
    (defect_label_transform, :47-65); the test split is filtered to the
    normal classes' samples,
  * no automatic download in this environment (zero egress) — place the
    extracted archive at ``root``/mvtec/<class>/{train,test}/...
"""

import os
import os.path as pt
from typing import List, Tuple

import numpy as np

from eoe_tpu.datasets.bases import ADDataset, ArraySource, Subset
from eoe_tpu.datasets.folder import decode_image

LABELS = ('bottle', 'cable', 'capsule', 'carpet', 'grid', 'hazelnut', 'leather',
          'metal_nut', 'pill', 'screw', 'tile', 'toothbrush', 'transistor',
          'wood', 'zipper')
NORMAL_DEFECT = "good"
NORMAL_DEFECT_IDX = 0
ENLARGE = 10


def _blob_path(root: str, hw: Tuple[int, int]) -> str:
    return pt.join(root, f"admvtec_{hw[0]}x{hw[1]}.npz")


def build_blob(root: str, hw: Tuple[int, int], logger=None) -> str:
    """Preprocess the raw folder tree into the resized array blob
    (role of MvTec.download+process, mvtec.py:194-256)."""
    classes = [d for d in sorted(os.listdir(root)) if pt.isdir(pt.join(root, d))]
    classes = [c for c in classes if c in LABELS]
    if not classes:
        raise FileNotFoundError(
            f"No MVTec-AD data found under {root}. Download mvtec_anomaly_detection.tar.xz "
            f"from https://www.mvtec.com/company/research/datasets/mvtec-ad and extract it "
            f"there (no network egress in this environment).")
    anomaly_label_strings: List[str] = [NORMAL_DEFECT]
    tr_imgs, tr_lbls, te_imgs, te_lbls, te_anom = [], [], [], [], []
    for cls in classes:
        ci = LABELS.index(cls)
        tdir = pt.join(root, cls, "train", NORMAL_DEFECT)
        for fn in sorted(os.listdir(tdir)):
            if fn.lower().endswith((".png", ".jpg")):
                tr_imgs.append(decode_image(pt.join(tdir, fn), hw))
                tr_lbls.append(ci)
        edir = pt.join(root, cls, "test")
        for defect in sorted(os.listdir(edir)):
            ddir = pt.join(edir, defect)
            if not pt.isdir(ddir):
                continue
            if defect == NORMAL_DEFECT:
                didx = NORMAL_DEFECT_IDX
            else:
                name = f"{cls}_{defect}"
                if name not in anomaly_label_strings:
                    anomaly_label_strings.append(name)
                didx = anomaly_label_strings.index(name)
            for fn in sorted(os.listdir(ddir)):
                if fn.lower().endswith((".png", ".jpg")):
                    te_imgs.append(decode_image(pt.join(ddir, fn), hw))
                    te_lbls.append(ci)
                    te_anom.append(didx)
    path = _blob_path(root, hw)
    np.savez_compressed(
        path, train_data=np.stack(tr_imgs), train_labels=np.asarray(tr_lbls, np.int64),
        test_data=np.stack(te_imgs), test_labels=np.asarray(te_lbls, np.int64),
        test_anomaly_labels=np.asarray(te_anom, np.int64),
        anomaly_label_strings=np.asarray(anomaly_label_strings))
    if logger is not None:
        logger.print(f"preprocessed MVTec-AD into {path}")
    return path


class ADMvTec(ADDataset):
    base_folder = "mvtec"

    def __init__(self, root: str, normal_classes, nominal_label, train_specs, test_specs,
                 raw_shape, logger=None, limit_samples=float("inf"),
                 train_conditional=(), test_conditional=(), ds_statistics=None, rng=None):
        ds_root = pt.join(root, self.base_folder)
        super().__init__(
            root=ds_root, normal_classes=normal_classes, nominal_label=nominal_label,
            train_specs=train_specs, test_specs=test_specs, n_classes=15,
            raw_shape=raw_shape, logger=logger, limit_samples=limit_samples,
            train_conditional=train_conditional, test_conditional=test_conditional,
            ds_statistics=ds_statistics, rng=rng)
        hw = self.raw_shape[:2]
        blob = _blob_path(ds_root, hw)
        if not pt.exists(blob):
            blob = build_blob(ds_root, hw, logger)
        d = np.load(blob, allow_pickle=False)
        self.anomaly_label_strings = [str(s) for s in d["anomaly_label_strings"]]

        # train: 'good' only, enlarged 10x by REPEATING SUBSET INDICES —
        # repeating the data (like the reference, mvtec.py:160-162) would 10x
        # RAM and push the source past the device-resident threshold
        self._train_source = ArraySource(d["train_data"], d["train_labels"])
        base_subset = self.create_subset(self._train_source)
        self._train_set = Subset(self._train_source,
                                 np.tile(base_subset.indices, ENLARGE))

        self._test_source = ArraySource(d["test_data"], d["test_labels"])
        self.test_anomaly_labels = d["test_anomaly_labels"]
        keep = np.argwhere(np.isin(d["test_labels"], self.normal_classes)).flatten()
        self._test_set = Subset(self._test_source, keep)
        self.finalize()

    def binary_targets(self, subset: Subset) -> np.ndarray:
        """Test labels follow the ground-truth defect annotation, not the
        object class (parity: defect_label_transform, mvtec.py:47-65)."""
        if subset is self._test_set or (subset is not None and
                                        subset.source is self._test_source):
            anom = self.test_anomaly_labels[subset.indices]
            return np.where(anom == NORMAL_DEFECT_IDX, self.nominal_label,
                            self.anomalous_label).astype(np.int64)
        return super().binary_targets(subset)
