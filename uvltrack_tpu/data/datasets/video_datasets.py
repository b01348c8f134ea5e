"""Training video-dataset adapters: LaSOT(+ext), GOT-10k, TrackingNet, TNL2K,
OTB99.

Parity with lib/train/dataset/{lasot,got10k,tracking_net,tnl2k,otb99}.py:
standard public disk layouts, visibility from occlusion/out-of-view (LaSOT,
TNL2K) or absence+cover labels (GOT-10k), per-sequence language where the
dataset provides it. Capability flags route datasets to sampler tasks
(lasot.py:83-89, got10k.py:77-83, tnl2k.py:36-42, otb99.py:30-36).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from .base import BaseVideoDataset


def _load_csv(path: str) -> np.ndarray:
    for d in (",", "\t", " "):
        try:
            return np.loadtxt(path, delimiter=d, dtype=np.float64, ndmin=2)
        except Exception:
            continue
    raise IOError(f"cannot parse {path}")


def _read_line(path: str) -> str:
    with open(path) as f:
        return f.readlines()[0].rstrip()


def _read_int_line(path: str) -> np.ndarray:
    with open(path) as f:
        txt = f.read().replace("\n", ",")
    return np.array([int(v) for v in txt.split(",") if v.strip() != ""], np.int64)


class Lasot(BaseVideoDataset):
    """<root>/<class>/<class-N>/{img/%08d.jpg, groundtruth.txt,
    full_occlusion.txt, out_of_view.txt, nlp.txt}"""

    def __init__(self, root: str, split: str = "train", image_loader=None,
                 name: str = "lasot"):
        from .base import opencv_loader

        super().__init__(name, root, image_loader or opencv_loader)
        self.sequence_list = self._list_sequences(split)

    def _list_sequences(self, split) -> List[str]:
        split_file = os.path.join(self.root, f"{split}ing_set.txt")
        if os.path.exists(split_file):
            with open(split_file) as f:
                return [l.strip() for l in f if l.strip()]
        seqs = sorted(os.path.basename(p.rstrip(os.sep)) for p in
                      glob.glob(os.path.join(self.root, "*", "*-*" + os.sep)))
        return seqs

    def is_grounding_sequence(self):
        return True

    def is_vl_sequence(self):
        return True

    def _seq_path(self, seq_id):
        name = self.sequence_list[seq_id]
        cls = name.rsplit("-", 1)[0]
        return os.path.join(self.root, cls, name)

    def get_sequence_info(self, seq_id):
        p = self._seq_path(seq_id)
        bbox = _load_csv(os.path.join(p, "groundtruth.txt"))
        occ = _read_int_line(os.path.join(p, "full_occlusion.txt"))
        oov = _read_int_line(os.path.join(p, "out_of_view.txt"))
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        visible = (occ == 0) & (oov == 0) & valid
        return {"bbox": bbox, "valid": valid, "visible": visible}

    def get_language(self, seq_id):
        p = os.path.join(self._seq_path(seq_id), "nlp.txt")
        return _read_line(p).lower() if os.path.exists(p) else None

    def get_frames(self, seq_id, frame_ids, anno=None):
        p = self._seq_path(seq_id)
        frames = [self.image_loader(os.path.join(p, "img", f"{i+1:08d}.jpg"))
                  for i in frame_ids]
        anno = anno or self.get_sequence_info(seq_id)
        frame_annos = {k: [v[i] for i in frame_ids] for k, v in anno.items()}
        return frames, frame_annos, {"language": self.get_language(seq_id)}


class LasotExt(Lasot):
    def __init__(self, root: str, image_loader=None):
        super().__init__(root, split="train", image_loader=image_loader,
                         name="lasotext")

    def is_grounding_sequence(self):
        return False


class Got10k(BaseVideoDataset):
    """<root>/<split>/GOT-10k_*_{N}/{%08d.jpg, groundtruth.txt, absence.label,
    cover.label, meta_info.ini}. Tracking-only (no language)."""

    def __init__(self, root: str, split: str = "vottrain", image_loader=None):
        from .base import opencv_loader

        super().__init__("got10k", root, image_loader or opencv_loader)
        self.split = split
        base = os.path.join(root, "train")
        list_file = {
            "vottrain": "got10k_vot_train_split.txt",
            "votval": "got10k_vot_val_split.txt",
            "ltrtrain": "got10k_train_split.txt",
            "ltrval": "got10k_val_split.txt",
            "train": None,
        }.get(split)
        with open(os.path.join(base, "list.txt")) as f:
            all_seqs = [l.strip() for l in f if l.strip()]
        split_path = self._find_split_file(root, list_file)
        if split_path:
            with open(split_path) as f:
                ids = [int(l) for l in f if l.strip()]
            self.sequence_list = [all_seqs[i] for i in ids]
        else:
            self.sequence_list = all_seqs
        self.base = base

    @staticmethod
    def _find_split_file(root: str, list_file):
        """Split files (integer sequence-id lists, pytracking/LTR lineage) are
        searched in the dataset root and in <repo>/data_specs/ — place the
        published files there (parity: lib/train/data_specs/)."""
        if not list_file:
            return None
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        for cand in (os.path.join(root, list_file),
                     os.path.join(repo, "data_specs", list_file)):
            if os.path.exists(cand):
                return cand
        return None

    def is_grounding_sequence(self):
        return False

    def is_vl_sequence(self):
        return False

    def _seq_path(self, seq_id):
        return os.path.join(self.base, self.sequence_list[seq_id])

    def get_sequence_info(self, seq_id):
        p = self._seq_path(seq_id)
        bbox = _load_csv(os.path.join(p, "groundtruth.txt"))
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        absence = _read_int_line(os.path.join(p, "absence.label"))
        cover = _read_int_line(os.path.join(p, "cover.label"))
        visible = (absence == 0) & (cover > 0) & valid
        return {"bbox": bbox, "valid": valid, "visible": visible,
                "visible_ratio": cover.astype(np.float64) / 8.0}

    def get_frames(self, seq_id, frame_ids, anno=None):
        p = self._seq_path(seq_id)
        frames = [self.image_loader(os.path.join(p, f"{i+1:08d}.jpg"))
                  for i in frame_ids]
        anno = anno or self.get_sequence_info(seq_id)
        frame_annos = {k: [v[i] for i in frame_ids] for k, v in anno.items()
                       if k != "visible_ratio"}
        return frames, frame_annos, {"language": None}


class TrackingNet(BaseVideoDataset):
    """<root>/TRAIN_i/{anno/<seq>.txt, frames/<seq>/<j>.jpg}. Tracking-only."""

    def __init__(self, root: str, set_ids: Optional[List[int]] = None,
                 image_loader=None):
        from .base import opencv_loader

        super().__init__("trackingnet", root, image_loader or opencv_loader)
        set_ids = set_ids if set_ids is not None else list(range(12))
        self.sequence_list = []
        for s in set_ids:
            anno_dir = os.path.join(root, f"TRAIN_{s}", "anno")
            if not os.path.isdir(anno_dir):
                continue
            for f in sorted(os.listdir(anno_dir)):
                if f.endswith(".txt"):
                    self.sequence_list.append((s, os.path.splitext(f)[0]))

    def is_grounding_sequence(self):
        return False

    def get_sequence_info(self, seq_id):
        s, name = self.sequence_list[seq_id]
        bbox = _load_csv(os.path.join(self.root, f"TRAIN_{s}", "anno", f"{name}.txt"))
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        return {"bbox": bbox, "valid": valid, "visible": valid.copy()}

    def get_frames(self, seq_id, frame_ids, anno=None):
        s, name = self.sequence_list[seq_id]
        fdir = os.path.join(self.root, f"TRAIN_{s}", "frames", name)
        frames = [self.image_loader(os.path.join(fdir, f"{i}.jpg")) for i in frame_ids]
        anno = anno or self.get_sequence_info(seq_id)
        frame_annos = {k: [v[i] for i in frame_ids] for k, v in anno.items()}
        return frames, frame_annos, {"language": None}


class Tnl2k(BaseVideoDataset):
    """<root>/<seq>/{imgs/*, groundtruth.txt, language.txt}. All three tasks."""

    def __init__(self, root: str, image_loader=None):
        from .base import opencv_loader

        super().__init__("tnl2k", root, image_loader or opencv_loader)
        self.sequence_list = sorted(
            os.path.basename(p.rstrip(os.sep))
            for p in glob.glob(os.path.join(root, "*" + os.sep))
            if os.path.exists(os.path.join(p, "groundtruth.txt")))
        self._frames_cache = {}

    def is_grounding_sequence(self):
        return True

    def is_vl_sequence(self):
        return True

    def _seq_path(self, seq_id):
        return os.path.join(self.root, self.sequence_list[seq_id])

    def _frame_files(self, seq_id):
        if seq_id not in self._frames_cache:
            self._frames_cache[seq_id] = sorted(
                glob.glob(os.path.join(self._seq_path(seq_id), "imgs", "*")))
        return self._frames_cache[seq_id]

    def get_sequence_info(self, seq_id):
        p = self._seq_path(seq_id)
        bbox = _load_csv(os.path.join(p, "groundtruth.txt"))
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        visible = valid.copy()
        occ_f = os.path.join(p, "full_occlusion.txt")
        oov_f = os.path.join(p, "out_of_view.txt")
        if os.path.exists(occ_f) and os.path.exists(oov_f):
            occ = _read_int_line(occ_f)
            oov = _read_int_line(oov_f)
            n = min(len(occ), len(bbox))
            visible[:n] = (occ[:n] == 0) & (oov[:n] == 0) & valid[:n]
        return {"bbox": bbox, "valid": valid, "visible": visible}

    def get_language(self, seq_id):
        return _read_line(os.path.join(self._seq_path(seq_id), "language.txt")).lower()

    def get_frames(self, seq_id, frame_ids, anno=None):
        files = self._frame_files(seq_id)
        frames = [self.image_loader(files[i]) for i in frame_ids]
        anno = anno or self.get_sequence_info(seq_id)
        frame_annos = {k: [v[i] for i in frame_ids] for k, v in anno.items()}
        return frames, frame_annos, {"language": self.get_language(seq_id)}


class Otb99(BaseVideoDataset):
    """<root>/OTB_videos/<seq> + OTB_query_<split>/<seq>.txt. All tasks."""

    def __init__(self, root: str, split: str = "train", image_loader=None):
        from .base import opencv_loader

        super().__init__("otb99", root, image_loader or opencv_loader)
        qdir = os.path.join(root, f"OTB_query_{split}")
        self.split = split
        self.sequence_list = sorted(
            os.path.splitext(os.path.basename(p))[0]
            for p in glob.glob(os.path.join(qdir, "*.txt")))
        self._frames_cache = {}

    def is_grounding_sequence(self):
        return True

    def is_vl_sequence(self):
        return True

    def _seq_path(self, seq_id):
        return os.path.join(self.root, "OTB_videos", self.sequence_list[seq_id])

    def _frame_files(self, seq_id):
        if seq_id not in self._frames_cache:
            self._frames_cache[seq_id] = sorted(
                glob.glob(os.path.join(self._seq_path(seq_id), "img", "*")))
        return self._frames_cache[seq_id]

    def get_sequence_info(self, seq_id):
        bbox = _load_csv(os.path.join(self._seq_path(seq_id), "groundtruth_rect.txt"))
        valid = (bbox[:, 2] > 0) & (bbox[:, 3] > 0)
        return {"bbox": bbox, "valid": valid, "visible": valid.copy()}

    def get_language(self, seq_id):
        q = os.path.join(self.root, f"OTB_query_{self.split}",
                         f"{self.sequence_list[seq_id]}.txt")
        return _read_line(q).lower()

    def get_frames(self, seq_id, frame_ids, anno=None):
        files = self._frame_files(seq_id)
        frames = [self.image_loader(files[i]) for i in frame_ids]
        anno = anno or self.get_sequence_info(seq_id)
        frame_annos = {k: [v[i] for i in frame_ids] for k, v in anno.items()}
        return frames, frame_annos, {"language": self.get_language(seq_id)}
