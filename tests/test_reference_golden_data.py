"""Executing-reference goldens for the data pipeline (L0/L1).

Round 3 left the readers verified against transcriptions only (VERDICT r3
item 5); here the reference's OWN ``VideoDataset`` / ``AuxDataset`` /
``MultiVideoDataset`` bytecode runs over a tiny on-disk fixture tree and our
scan / frame-index math / decode+augment / episode assembly are asserted
against what it actually computes:

- scan parity (``read_dir``/``_select_fold`` vs VideoStore)
- test-mode ``get_seq`` pixel parity (deterministic trim + resize + center
  crop + ToTensor vs ``load_clip``), including the odd-margin CenterCrop
  rounding case the golden originally caught
- train-mode ``get_seq`` pixel parity with the reference's RNG draws recorded
  and replayed into our loader
- full ``__getitem__`` episode parity (selection bookkeeping, labels,
  real labels, teacher-feature pairing) as shuffle-insensitive multisets
- the released ``get_teacher_feature`` crash, proven by executing it
- AuxDataset's modality-path substitution + plain-linspace frame rule
  (the rule our extract/pretrain paths now use via ``frame_rule="aux"``)
- MultiVideoDataset's zero-fill for missing modalities

Skips when /root/reference is absent. PIL JPEG decode is deterministic, so
pixel comparisons are exact.
"""
import os
import random as pyrandom

import numpy as np
import pytest
import torch

import refexec
from refexec import requires_reference, t2n

from litemkd_tpu.data.video import (VideoStore, load_clip,
                                    sample_frame_indices,
                                    sample_frame_indices_aux)

pytestmark = requires_reference

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

SEQ, IMG = 8, 84        # aux-section geometry (and the pub84 param point)
# The episodic scan/pixel/episode goldens run at BOTH published geometries
# (VERDICT r4 item 7): img 84 → 96-shorter-side resize (options.py
# img_size·256/224), seq 8; and the canonical 224 → 256 resize with an
# off-canonical seq_len=5 so get_seq's trimmed-linspace and the episode
# assembly are pinned away from seq_len=8 too.
GEOMETRIES = {"pub84": (8, 84), "canon224_seq5": (5, 224)}
CLASSES = ("c_apple", "c_banana", "c_cherry")
N_FRAMES = (8, 11, 14, 19)
DIMS = ((90, 72), (64, 74), (100, 80), (76, 64))   # (w, h); (64,74) → the
# resized height 111 gives a 27-pixel crop margin: round(13.5)=14 ≠ 13 = floor
FEAT_D = 16


def _write_video(vdir, n_frames, w, h, rng):
    os.makedirs(vdir, exist_ok=True)
    for i in range(n_frames):
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(np.asarray(arr)).save(
            os.path.join(vdir, f"frame{i:05d}.jpg"), quality=92)


@pytest.fixture(scope="module", params=sorted(GEOMETRIES))
def tree(request, tmp_path_factory):
    """rgb tree + split lists + teacher feature tree at one GEOMETRIES
    point. Videos 0-1 of each class are train, 2-3 test; frame counts and
    dims vary per video."""
    seq, img = GEOMETRIES[request.param]
    root = tmp_path_factory.mktemp(f"refdata_{request.param}")
    rgb = root / "rgb_l8"
    anno = root / "splits"
    feat = root / "feature" / "multi_feature"   # ≥3 '/' segments for the
    anno.mkdir(parents=True)                     # released teacher-path split
    rng = np.random.default_rng(0)
    train_lines, test_lines = [], []
    features = {}
    for c in CLASSES:
        for v in range(4):
            vid = f"{c}_v{v}"
            n, (w, h) = N_FRAMES[v], DIMS[v]
            _write_video(str(rgb / c / vid), n, w, h, rng)
            (train_lines if v < 2 else test_lines).append(f"{c}/{vid}.avi")
            f = rng.normal(size=(seq, FEAT_D)).astype(np.float32)
            fdir = feat / c / vid
            fdir.mkdir(parents=True)
            np.save(str(fdir / "feature.npy"), f)
            features[(c, vid)] = f
    (anno / "trainlist01.txt").write_text("\n".join(train_lines) + "\n")
    (anno / "testlist01.txt").write_text("\n".join(test_lines) + "\n")
    return {"root": str(root), "rgb": str(rgb), "anno": str(anno),
            "feat": str(feat), "features": features,
            "seq": seq, "img": img}


def _ref_args(ns, tree):
    return refexec.student_args(
        ns, RGB_path=tree["rgb"], teacher_path=tree["feat"],
        traintestlist=tree["anno"], split=1, seq_len=tree["seq"],
        img_size=tree["img"],
        way=3, shot=1, query_per_class=2, query_per_class_test=1)


@pytest.fixture(scope="module")
def ref_ds(tree):
    """The reference VideoDataset with the MINIMAL released-crash patch
    (SURVEY §3.6): ``__init__`` comments out the two teacher Split attrs and
    the ``get_train_or_test_db_teacher`` DEF line (video_reader.py:81-82,
    289) while the method's body was absorbed into read_dir's tail — which
    therefore crashes at construction. Restoring exactly those three pieces
    lets the reference's own teacher scan + get_teacher_feature bytecode run
    unmodified (the scan adds each video's feature path as a bare string, so
    ``np.load(path)`` works and the garbage ``final_path`` is computed from
    the string's first characters and discarded)."""
    ns = refexec.student_half()
    VD, Split = ns.video_reader.VideoDataset, ns.video_reader.Split

    class PatchedVideoDataset(VD):
        def __init__(self, args):
            self.train_split_teacher = Split()
            self.test_split_teacher = Split()
            super().__init__(args)

        def get_teacher_feature(self, label, idx=-1):
            # the released body (video_reader.py:388-394) indexes the stored
            # path STRING's first character for its (unused) final_path and
            # raises IndexError (pinned below); this is the 3-line evident
            # intent the body's np.load line implements
            c = self.get_train_or_test_db_teacher()
            path, vid_id = c.get_rand_vid(label, idx)
            return torch.from_numpy(np.load(path)), vid_id

        def get_train_or_test_db_teacher(self, split=None):
            # the commented-out body, verbatim semantics (video_reader.py
            # :291-303)
            if split is None:
                get_train_split = self.train
            elif split in self.train_test_lists["train"]:
                get_train_split = True
            elif split in self.train_test_lists["test"]:
                get_train_split = False
            else:
                return None
            return (self.train_split_teacher if get_train_split
                    else self.test_split_teacher)

    with refexec.activate(ns):
        return PatchedVideoDataset(_ref_args(ns, tree))


@pytest.fixture(scope="module")
def our_store(tree):
    # use_native=False: the goldens pin the PIL path; native-vs-PIL parity
    # has its own seed-swept tests in test_data.py
    return VideoStore(tree["rgb"], tree["anno"], 1, tree["seq"], tree["img"],
                      use_native=False)


def _ref_clip_uint8(t):
    """(T, C, H, W) float in [0,1] → (T, H, W, 3) uint8, exactly."""
    arr = t2n(t) * 255.0
    out = np.rint(arr).astype(np.uint8)
    assert np.abs(arr - np.rint(arr)).max() < 1e-3   # ToTensor is x/255
    return out.transpose(0, 2, 3, 1)


def test_scan_parity(tree, ref_ds, our_store):
    """read_dir's Split contents == our SplitIndex: same class ids, same
    per-class video order, same frame lists (basenames), same split
    assignment."""
    for train in (True, False):
        ref_split = ref_ds.train_split if train else ref_ds.test_split
        ours = our_store.split(train)
        assert len(ref_split) == sum(
            len(ours.videos_for_class(c)) for c in ours.classes())
        for cid in ours.classes():
            recs = ours.videos_for_class(cid)
            for i, rec in enumerate(recs):
                paths, vid_idx = ref_split.get_rand_vid(cid, i)
                assert [os.path.basename(p) for p in paths] == \
                    [os.path.basename(p) for p in rec.frame_paths]
                assert os.path.basename(os.path.dirname(paths[0])) == \
                    rec.video_id
    assert list(our_store.class_names) == list(ref_ds.class_folders)


def test_get_seq_test_mode_pixels_match(ref_ds, our_store):
    """Deterministic test-mode clips byte-match: trimmed-linspace frame
    selection + bilinear shorter-side resize (the release's swapped
    'nearest' label) + ROUNDED center crop + /255."""
    ref_ds.train = False
    ours = our_store.split(False)
    rng = np.random.default_rng(0)   # unused on the test path
    for cid in ours.classes():
        for i, rec in enumerate(ours.videos_for_class(cid)):
            want_t, _ = ref_ds.get_seq(cid, i)
            want = _ref_clip_uint8(want_t)
            got = our_store.load(rec, train=False, rng=rng)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"class {cid} video {i}")


class _Recorder:
    """Spy for the reference's global-`random` draws."""

    def __init__(self, seed):
        self._r = pyrandom.Random(seed)
        self.log = []

    def randint(self, a, b):
        v = self._r.randint(a, b)
        self.log.append(("randint", a, b, v))
        return v

    def random(self):
        v = self._r.random()
        self.log.append(("random", None, None, v))
        return v


class _Replay:
    """numpy-Generator stand-in that replays recorded draws in OUR call
    order, asserting each value is legal for the requested bounds."""

    def __init__(self, values):
        self._q = list(values)

    def integers(self, lo, hi):
        v = self._q.pop(0)
        assert lo <= v < hi, (v, lo, hi)
        return v

    def random(self):
        return self._q.pop(0)


@pytest.mark.parametrize("vidx", [0, 1], ids=["n8", "n11"])
def test_get_seq_train_mode_pixels_match(ref_ds, our_store, monkeypatch,
                                         vidx, tree):
    """Train-mode clips byte-match when the reference's own RNG draws
    (frame-window randints, flip coin, crop x/y) are replayed into our
    loader. Draw order differs only in the crop axes (reference x-then-y,
    ours y-then-x — videotransforms/video_transforms.py:152-153 vs
    load_clip)."""
    rec = _Recorder(seed=7 + vidx)
    monkeypatch.setattr(pyrandom, "randint", rec.randint)
    monkeypatch.setattr(pyrandom, "random", rec.random)
    ref_ds.train = True
    cid = 0
    ours = our_store.split(True)
    our_rec = ours.videos_for_class(cid)[vidx]
    n = our_rec.n_frames
    want_t, _ = ref_ds.get_seq(cid, vidx)
    monkeypatch.undo()
    want = _ref_clip_uint8(want_t)

    vals = [v for (_, _, _, v) in rec.log]
    if n == tree["seq"]:
        flip, x1, y1 = vals
        replay = [flip, y1, x1]
    else:
        start, end, flip, x1, y1 = vals
        replay = [start, end, flip, y1, x1]
    got = our_store.load(our_rec, train=True, rng=_Replay(replay))
    np.testing.assert_array_equal(got, want)


def test_released_videodataset_crashes_at_construction(tree):
    """The UNpatched release cannot even construct: read_dir absorbed the
    commented-out read_teacher_feature_dir's body (video_reader.py:197-272)
    and calls the also-commented get_train_or_test_db_teacher — the
    executing proof behind SURVEY §3.6's crash-patch note."""
    ns = refexec.student_half()
    with refexec.activate(ns), pytest.raises(AttributeError,
                                             match="db_teacher"):
        ns.video_reader.VideoDataset(_ref_args(ns, tree))


def test_released_get_teacher_feature_crashes(ref_ds):
    """Even with the scan restored, the RELEASED get_teacher_feature body
    crashes: the teacher scan stores each video's feature path as a bare
    STRING (read_dir tail, video_reader.py:269), so ``path[0]`` is its first
    character and the (discarded) final_path construction indexes past
    ``'/'.split('/')`` — IndexError (video_reader.py:391-392). The episode
    golden below therefore runs with the 3-line evident-intent body."""
    ns = refexec.student_half()
    raw = ns.video_reader.VideoDataset.get_teacher_feature
    with pytest.raises(IndexError):
        raw(ref_ds, 0, 0)


def test_episode_assembly_matches_reference(ref_ds, our_store, tree):
    """One full __getitem__ episode (test mode → deterministic clips): every
    (clip, teacher feature, label, real label) the reference assembles is
    exactly reproducible from OUR scan + loader + feature pairing, with the
    reference's episode-local label bookkeeping:

    - support/target labels are positions into batch_class_list
    - real_target_labels are raw class ids
    - teacher features pair by (class, video) with the clip

    The reference's support/target shuffles make order arbitrary, so entries
    are matched by pixel content (random-noise frames make clips unique).
    The teacher features flow through the reference's OWN scanned teacher
    splits and get_teacher_feature (see the ref_ds patch note)."""
    ours_all = {True: our_store.split(True), False: our_store.split(False)}
    ref_ds.train = False
    pyrandom.seed(31)
    task = ref_ds[0]

    # test-mode episode: shot + query_per_class_test must fit the 2
    # test videos per class
    way, shot, qpc = 3, 1, 1
    batch_classes = [int(c) for c in t2n(task["batch_class_list"])]

    # our deterministic test-mode clip for every (class, within-class idx)
    lookup = {}
    rng = np.random.default_rng(0)
    for cid in ours_all[False].classes():
        for i, rec in enumerate(ours_all[False].videos_for_class(cid)):
            clip = our_store.load(rec, train=False, rng=rng)
            lookup[clip.tobytes()] = (cid, rec.video_id)

    for half, n_vids, with_real in (("support", way * shot, False),
                                    ("target", way * qpc, True)):
        clips = _ref_clip_uint8(task[f"{half}_set"]).reshape(
            n_vids, tree["seq"], tree["img"], tree["img"], 3)
        feats = t2n(task[f"{half}_set_feature_teacher"]).reshape(
            n_vids, tree["seq"], FEAT_D)
        labels = [int(x) for x in t2n(task[f"{half}_labels"])]
        for i in range(n_vids):
            key = clips[i].tobytes()
            assert key in lookup, f"{half} clip {i} not reproducible by our loader"
            cid, vid = lookup[key]
            assert batch_classes[labels[i]] == cid, (half, i)
            np.testing.assert_array_equal(
                feats[i], tree["features"][(our_store.class_names[cid], vid)],
                err_msg=f"{half} teacher feature {i}")
            if with_real:
                real = [int(x) for x in t2n(task["real_target_labels"])]
                assert real[i] == cid


# ---------------------------------------------------------------------------
# AuxDataset (teacher/code/AuxDataset.py) — extraction/pretraining reader
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def aux_tree(tmp_path_factory):
    """Modality trees rgb_l8/depth_l8 with per-modality pixel content, plus
    the 03-split lists AuxDataset hardcodes for parsing_label."""
    root = tmp_path_factory.mktemp("auxdata")
    anno = root / "splits"
    anno.mkdir()
    rng = np.random.default_rng(5)
    lines = []
    for c in CLASSES[:2]:
        for v in range(2):
            vid = f"{c}_a{v}"
            n, (w, h) = (11, (90, 72)) if v == 0 else (8, (64, 74))
            for m in ("rgb", "depth"):
                _write_video(str(root / f"{m}_l8" / c / vid), n, w, h, rng)
            lines.append(f"{c}/{vid}")
    (anno / "trainlist03.txt").write_text("\n".join(lines) + "\n")
    (anno / "testlist03.txt").write_text("\n".join(lines) + "\n")
    return {"root": str(root), "anno": str(anno), "lines": lines}


@pytest.fixture(scope="module")
def aux_ds(aux_tree):
    import types
    nt = refexec.teacher_half()
    args = types.SimpleNamespace(
        path=os.path.join(aux_tree["root"], "rgb_l8"), seq_len=SEQ,
        mode="test", img_size=IMG, traintestlist=aux_tree["anno"], split=3,
        modality="rgb", getitem_name="get_video")
    with refexec.activate(nt):
        return nt.AuxDataset.AuxDataset(args)


def test_aux_get_seq_matches_aux_rule_and_modality_swap(aux_ds, aux_tree):
    """AuxDataset.get_seq: (a) the modality argument swaps the path's
    ``*_l8`` component (AuxDataset.py:141-143) — frames really come from the
    OTHER tree; (b) the effective frame rule is the plain linspace our
    ``frame_rule="aux"`` loaders use (the pre-trim makes the video_reader
    math identity); (c) pixels match load_clip exactly (test transforms)."""
    for modality in ("rgb", "depth"):
        for line in aux_tree["lines"]:
            _, want_t = aux_ds.get_seq(line, modality=modality)
            want = _ref_clip_uint8(want_t)
            vdir = os.path.join(aux_tree["root"], f"{modality}_l8", line)
            paths = sorted(os.path.join(vdir, f) for f in os.listdir(vdir))
            idxs = sample_frame_indices_aux(len(paths), SEQ)
            got = load_clip(paths, idxs, img_size=IMG, train=False,
                            rng=np.random.default_rng(0), resize_to=96)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{modality}/{line}")


def test_aux_frame_rule_differs_from_episode_rule():
    """The two rules genuinely differ (n ≥ seq_len+3: the episodic test rule
    trims one frame each end; aux does not) — the divergence that motivated
    frame_rule='aux' on the extract/pretrain paths."""
    aux = sample_frame_indices_aux(19, SEQ)
    epi = sample_frame_indices(19, SEQ, train=False,
                               rng=np.random.default_rng(0))
    assert aux[0] == 0 and aux[-1] == 18
    assert epi[0] == 1 and epi[-1] == 17
    assert not np.array_equal(aux, epi)


# ---------------------------------------------------------------------------
# MultiVideoDataset.get_feature_seq — zero-fill for missing modalities
# ---------------------------------------------------------------------------

def test_multi_feature_zero_fill_matches_reference(tmp_path):
    """The reference zero-fills any modality whose feature.npy is missing
    with zeros_like(m1) (multi_video_reader.py:254-284); our
    MultiModalFeatureStore.load does the same. Executed against the real
    bytecode via the unbound method over a feature tree where depth is
    missing for one video and flow for another."""
    import types
    from litemkd_tpu.data.features import MultiModalFeatureStore

    nt = refexec.teacher_half()
    rng = np.random.default_rng(11)
    feat_root = tmp_path / "feats"
    anno = tmp_path / "splits"
    anno.mkdir()
    vids = [("c_apple", "c_apple_m0"), ("c_apple", "c_apple_m1"),
            ("c_banana", "c_banana_m0")]
    # rgb always present; depth missing for m1; flow missing for banana_m0
    missing = {("depth", "c_apple_m1"), ("flow", "c_banana_m0")}
    stored = {}
    for c, vid in vids:
        for m in ("rgb", "depth", "flow"):
            if (m, vid) in missing:
                continue
            d = feat_root / m / c / vid
            d.mkdir(parents=True)
            f = rng.normal(size=(SEQ, FEAT_D)).astype(np.float32)
            np.save(str(d / "feature.npy"), f)
            stored[(m, vid)] = f
    (anno / "trainlist01.txt").write_text(
        "\n".join(f"{c}/{vid}.avi" for c, vid in vids) + "\n")
    (anno / "testlist01.txt").write_text("c_cherry/none.avi\n")

    Split = nt.multi_video_reader.Split
    sp = Split()
    for i, (c, vid) in enumerate(vids):
        # rgb-scan-style frame paths: [-3]=class is wrong in the released
        # layout ([-3] is the modality dir) — get_feature_seq only uses
        # [-3]/[-2] as (class, video), so store them accordingly
        sp.add_vid([os.path.join("x", c, vid, "frame00000.jpg")], i)
    fake = types.SimpleNamespace(
        get_train_or_test_db=lambda: sp,
        feature_save_path=str(feat_root),
        args=types.SimpleNamespace(m1="rgb", m2="depth", m3="flow",
                                   m4="depth", m5="flow",
                                   feature_save_path=str(feat_root)))
    get_feature_seq = nt.multi_video_reader.MultiVideoDataset.get_feature_seq

    store = MultiModalFeatureStore(
        {m: os.path.join(str(feat_root), m) for m in ("rgb", "depth", "flow")},
        str(anno), 1, SEQ, FEAT_D)
    index = store.split(True)
    for i, (c, vid) in enumerate(vids):
        m1, m2, m3, _, _, (cls, vf) = get_feature_seq(fake, i, 0)
        assert (cls, vf) == (c, vid)
        rec = next(r for cid in index.classes()
                   for r in index.videos_for_class(cid) if r.video_id == vid)
        ours = store.load_all(rec, train=True)
        np.testing.assert_array_equal(t2n(m1), ours["rgb"])
        np.testing.assert_array_equal(t2n(m2), ours["depth"])
        np.testing.assert_array_equal(t2n(m3), ours["flow"])
        if ("depth", vid) in missing:
            assert not t2n(m2).any() and not ours["depth"].any()
        if ("flow", vid) in missing:
            assert not t2n(m3).any() and not ours["flow"].any()
