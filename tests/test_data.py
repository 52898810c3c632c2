"""Data layer tests over a tiny on-disk fixture (frame tree + feature tree)."""
import os
import numpy as np
import pytest
from PIL import Image

from litemkd_tpu import preset
from litemkd_tpu.data import (VideoStore, FeatureStore, EpisodeSampler,
                              load_split_lists, sample_frame_indices,
                              draw_episode_spec, save_fixed_episodes,
                              load_fixed_episodes)

WAY, SHOT, QPC, T, D, IMG = 3, 2, 2, 4, 64, 32
N_CLASSES, VIDS_PER_CLASS = 5, 10
N_TRAIN = 7  # per class; rest are test
VIEW_VALUES = (20, 60, 100, 140)  # constant pixel value per camera view


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyset")
    rgb = root / "rgb_l8"
    feats = root / "multi_feature"
    ann = root / "splits"
    ann.mkdir()
    rng = np.random.default_rng(0)
    train_lines, test_lines = [], []
    for c in range(N_CLASSES):
        cname = f"class{c:02d}"
        for v in range(VIDS_PER_CLASS):
            vname = f"vid_{c:02d}_{v:02d}"
            vdir = rgb / cname / vname
            vdir.mkdir(parents=True)
            n_frames = T + (v % 3) * 2   # 4, 6 or 8 frames
            for fidx in range(n_frames):
                arr = rng.integers(0, 255, size=(40, 48, 3), dtype=np.uint8)
                Image.fromarray(arr).save(vdir / f"{fidx:05d}.jpg")
            fdir = feats / cname / vname
            fdir.mkdir(parents=True)
            np.save(fdir / "feature.npy",
                    rng.normal(size=(T, D)).astype(np.float32))
            line = f"{cname}/{vname}"
            (train_lines if v < N_TRAIN else test_lines).append(line)
    (ann / "trainlist03.txt").write_text("\n".join(train_lines) + "\n")
    (ann / "testlist03.txt").write_text("\n".join(test_lines) + "\n")
    # multi-camera sibling tree (all_view_rgb_l8/<view>/<class>/<video>): each
    # camera's frames are a constant, camera-unique pixel value so a decoded
    # clip identifies its source view
    for k in range(4):
        for c in range(N_CLASSES):
            cname = f"class{c:02d}"
            for v in range(VIDS_PER_CLASS):
                vdir = (root / "all_view_rgb_l8" / f"Camera_{k}" / cname /
                        f"vid_{c:02d}_{v:02d}")
                vdir.mkdir(parents=True)
                arr = np.full((40, 48, 3), VIEW_VALUES[k], np.uint8)
                for fidx in range(T):
                    Image.fromarray(arr).save(vdir / f"{fidx:05d}.jpg")
    return root


@pytest.fixture(scope="module")
def cfg():
    base = preset("tiny")
    return base.replace(episode=base.episode.__class__(
        way=WAY, shot=SHOT, query_per_class=QPC, query_per_class_test=1,
        seq_len=T, img_size=IMG))


def test_split_list_parsing(dataset_dir):
    lists = load_split_lists(str(dataset_dir / "splits"), 3)
    assert len(lists["train"]) == N_CLASSES * N_TRAIN
    assert len(lists["test"]) == N_CLASSES * (VIDS_PER_CLASS - N_TRAIN)
    assert "vid_00_00" in lists["train"]


def test_video_store_scan(dataset_dir, cfg):
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    assert len(vs.train_split) == N_CLASSES * N_TRAIN
    assert len(vs.test_split) == N_CLASSES * (VIDS_PER_CLASS - N_TRAIN)
    rec = vs.train_split.get(0, 0)
    rng = np.random.default_rng(0)
    clip = vs.load(rec, train=True, rng=rng)
    assert clip.shape == (T, IMG, IMG, 3)
    assert clip.dtype == np.uint8


def test_frame_sampling_math():
    """Exact reproduction of the reference index selection (video_reader.py:345-376)."""
    # n_frames == seq_len → identity
    np.testing.assert_array_equal(
        sample_frame_indices(8, 8, True, np.random.default_rng(0)), np.arange(8))
    # test mode: start=1, end=n-2, linspace
    idx = sample_frame_indices(20, 8, False, np.random.default_rng(0))
    np.testing.assert_array_equal(idx, np.linspace(1, 18, 8).astype(int))
    # test mode with tight range falls back to full span
    idx = sample_frame_indices(9, 8, False, np.random.default_rng(0))
    np.testing.assert_array_equal(idx, np.linspace(0, 8, 8).astype(int))
    # train mode: indices sorted, within range, exactly seq_len of them
    for seed in range(5):
        idx = sample_frame_indices(30, 8, True, np.random.default_rng(seed))
        assert len(idx) == 8 and (np.diff(idx) >= 0).all()
        assert idx.min() >= 0 and idx.max() <= 29


def test_feature_store(dataset_dir, cfg):
    fs = FeatureStore(str(dataset_dir / "multi_feature"),
                      str(dataset_dir / "splits"), 3, T, D)
    assert len(fs.train_split) == N_CLASSES * N_TRAIN
    rec = fs.train_split.get(1, 2)
    feat = fs.load(rec)
    assert feat.shape == (T, D)


def test_episode_sampler_full(dataset_dir, cfg):
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    fs = FeatureStore(str(dataset_dir / "multi_feature"),
                      str(dataset_dir / "splits"), 3, T, D)
    sampler = EpisodeSampler(cfg, vs, fs, num_workers=2)
    rng = np.random.default_rng(0)
    batch = sampler.sample_batch(rng, 2, train=True)
    S, Q = WAY * SHOT, WAY * QPC
    assert batch.support_clips.shape == (2, S, T, IMG, IMG, 3)
    assert batch.query_clips.shape == (2, Q, T, IMG, IMG, 3)
    assert batch.support_feats.shape == (2, S, T, D)
    assert batch.query_feats.shape == (2, Q, T, D)
    # labels are a balanced permutation of way classes
    for e in range(2):
        counts = np.bincount(batch.support_labels[e], minlength=WAY)
        np.testing.assert_array_equal(counts, [SHOT] * WAY)


def test_feature_only_sampler(dataset_dir, cfg):
    fs = FeatureStore(str(dataset_dir / "multi_feature"),
                      str(dataset_dir / "splits"), 3, T, D)
    sampler = EpisodeSampler(cfg, None, fs, num_workers=0)
    batch = sampler.sample_batch(np.random.default_rng(1), 2, train=False)
    # with no video store, clips fields carry the features
    assert batch.support_clips.shape == (2, WAY * SHOT, T, D)
    assert batch.query_clips.shape == (2, WAY * 1, T, D)


def test_fixed_episode_replay(dataset_dir, cfg, tmp_path):
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    sampler = EpisodeSampler(cfg, vs, None, num_workers=0)
    rng = np.random.default_rng(0)
    specs = [draw_episode_spec(vs.test_split, WAY, SHOT, 1, rng) for _ in range(3)]
    path = str(tmp_path / "fixed.json")
    save_fixed_episodes(specs, path)
    loaded = load_fixed_episodes(path)
    assert [s.to_json() for s in loaded] == [s.to_json() for s in specs]
    b1 = sampler.sample_batch(np.random.default_rng(7), 3, train=False, specs=loaded)
    b2 = sampler.sample_batch(np.random.default_rng(7), 3, train=False, specs=loaded)
    np.testing.assert_allclose(b1.support_clips, b2.support_clips)
    np.testing.assert_array_equal(b1.support_labels, b2.support_labels)


def test_zip_frame_store(dataset_dir, cfg, tmp_path):
    """The ssv2-style in-RAM zip path scans and decodes like the dir path."""
    import zipfile
    zip_path = str(tmp_path / "frames.zip")
    rgb_root = str(dataset_dir / "rgb_l8")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(rgb_root):
            for f in sorted(files):
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, os.path.dirname(rgb_root)))
    vs = VideoStore(zip_path, str(dataset_dir / "splits"), 3, T, IMG)
    assert len(vs.train_split) == N_CLASSES * N_TRAIN
    rec = vs.train_split.get(0, 0)
    clip = vs.load(rec, train=False, rng=np.random.default_rng(0))
    assert clip.shape == (T, IMG, IMG, 3) and clip.dtype == np.uint8


def test_metrics_logger_jsonl(tmp_path):
    import json as _json
    from litemkd_tpu.utils import MetricsLogger
    log = MetricsLogger(log_dir=str(tmp_path), run_name="t", print_freq=0)
    log.log(1, {"loss": 1.5, "accuracy": 0.5})
    log.info("hello")
    log.close()
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert files
    lines = [_json.loads(l) for l in open(tmp_path / files[0])]
    assert any(l.get("loss") == 1.5 for l in lines)
    assert any(l.get("info") == "hello" for l in lines)


def test_native_decoder_matches_pil(dataset_dir, cfg):
    """C++ decode path == PIL path for identity-resize JPEGs (crop/flip only;
    JPEG decode itself is bit-exact across libjpeg users)."""
    from litemkd_tpu import native
    if not native.available():
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    vs_pil = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                        3, T, IMG, use_native=False)
    vs_nat = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                        3, T, IMG, use_native=True)
    rec = vs_pil.train_split.get(0, 0)
    # frames are 40x48 > IMG=32: shorter side 40 != 256 → resize differs between
    # backends, so compare on the center-crop test path with resize bypassed by
    # checking shapes + on a no-resize fixture below
    for train in (False, True):
        c_nat = vs_nat.load(rec, train=train, rng=np.random.default_rng(5))
        assert c_nat.shape == (T, IMG, IMG, 3) and c_nat.dtype == np.uint8


def test_native_path_selected_when_available(dataset_dir, monkeypatch):
    """VideoStore's default (use_native=True) must actually take the C++
    decode path when the library loads — a silent permanent PIL fallback
    would erase the data-plane win without failing anything (VERDICT r2
    item 7)."""
    from litemkd_tpu import native
    from litemkd_tpu.data import video as video_mod
    if not native.available():
        pytest.skip("native decoder unavailable (no g++/libjpeg)")
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)                        # defaults: native on
    rec = vs.train_split.get(0, 0)
    monkeypatch.setattr(
        video_mod, "load_clip",
        lambda *a, **k: pytest.fail("PIL fallback used although the native "
                                    "decoder is available"))
    clip = vs.load(rec, train=True, rng=np.random.default_rng(3))
    assert clip.shape == (T, IMG, IMG, 3) and clip.dtype == np.uint8


def test_native_decoder_exact_on_identity_resize(tmp_path):
    """With shorter side == resize_to the resize is the identity in both
    backends → outputs must be byte-identical."""
    from litemkd_tpu import native
    from litemkd_tpu.data.video import load_clip, load_clip_native
    if not native.available():
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 255, size=(256, 300, 3), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    idxs = np.arange(3)
    a = load_clip(paths, idxs, img_size=224, train=False,
                  rng=np.random.default_rng(1))
    b = load_clip_native(paths, idxs, img_size=224, train=False,
                         rng=np.random.default_rng(1))
    assert b is not None
    np.testing.assert_array_equal(a, b)
    # train path: same rng stream → same crop/flip decisions → identical
    # bytes. Sweep seeds so BOTH flip outcomes are exercised (the C++ kernel
    # flips within the crop window; the wrapper mirrors the window so the
    # selected pixels match the flip-then-crop PIL/reference order)
    flips_seen = set()
    for seed in range(10):
        flips_seen.add(bool(np.random.default_rng(seed).random() < 0.5))
        a = load_clip(paths, idxs, img_size=224, train=True,
                      rng=np.random.default_rng(seed))
        b = load_clip_native(paths, idxs, img_size=224, train=True,
                             rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(a, b)
    assert flips_seen == {False, True}


def test_reference_fixed_episode_import(dataset_dir, cfg, tmp_path):
    """The reference's fixed_test.json schema (global video_idx + class_bc,
    gen_fixed_split.py:167-194) converts into our per-class EpisodeSpecs."""
    import json
    from litemkd_tpu.data import (VideoStore, EpisodeSampler,
                                  load_reference_fixed_episodes)
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    index = vs.split(False)
    offsets, off = {}, 0
    for c in index.classes():
        offsets[int(c)] = off
        off += index.n_videos(c)
    # build a reference-format file: 2 episodes over classes [1, 3, 4]
    data = {}
    n_test = VIDS_PER_CLASS - N_TRAIN   # 3 test videos per class
    for e in range(2):
        sup, qry = [], []
        for c in (1, 3, 4):
            for j in range(SHOT):
                sup.append({"id": len(sup), "class_bc": c,
                            "video_idx": offsets[c] + (j + e) % n_test})
            qry.append({"id": len(qry), "class_bc": c,
                        "video_idx": offsets[c] + (SHOT + e) % n_test})
        data[str(e)] = {"support": sup, "query": qry}
    path = tmp_path / "fixed_test.json"
    path.write_text(json.dumps(data))
    specs = load_reference_fixed_episodes(str(path), index)
    assert len(specs) == 2
    assert specs[0].classes == [1, 3, 4]
    assert specs[0].support_idx[0] == [0, 1]
    assert specs[1].support_idx[0] == [1, 2]
    assert specs[0].query_idx == [[2], [2], [2]]
    assert specs[1].query_idx == [[0], [0], [0]]
    # the converted specs drive real episode assembly
    sampler = EpisodeSampler(cfg, vs)
    batch = sampler.sample_batch(np.random.default_rng(0), 2, train=False,
                                 specs=specs)
    assert batch.support_clips.shape[0] == 2


def test_reference_fixed_episode_yaml(dataset_dir, tmp_path):
    """The reference emits fixed_test.yaml via ruamel (gen_fixed_split.py:194);
    the yaml path of the importer parses it identically to json."""
    import yaml
    from litemkd_tpu.data import VideoStore, load_reference_fixed_episodes
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    index = vs.split(False)
    offsets, off = {}, 0
    for c in index.classes():
        offsets[int(c)] = off
        off += index.n_videos(c)
    data = {"0": {"support": [{"id": 0, "class_bc": 2,
                               "video_idx": offsets[2] + 1}],
                  "query": [{"id": 0, "class_bc": 2,
                             "video_idx": offsets[2] + 2}]}}
    path = tmp_path / "fixed_test.yaml"
    path.write_text(yaml.safe_dump(data))
    specs = load_reference_fixed_episodes(str(path), index)
    assert specs[0].classes == [2]
    assert specs[0].support_idx == [[1]] and specs[0].query_idx == [[2]]
    # out-of-range indices fail loudly (scan-divergence guard)
    data["0"]["support"][0]["video_idx"] = 10 ** 6
    path.write_text(yaml.safe_dump(data))
    with pytest.raises(ValueError):
        load_reference_fixed_episodes(str(path), index)


def test_single_frame_sampling_is_random():
    """seq_len == 1 draws one random frame from the trimmed range
    (video_reader.py:373-374), at train AND test time — not a fixed linspace
    start frame."""
    train_draws = {int(sample_frame_indices(10, 1, True,
                                            np.random.default_rng(s))[0])
                   for s in range(50)}
    assert len(train_draws) > 1 and all(0 <= d <= 9 for d in train_draws)
    # test-time trim is 1 frame each end → uniform over [1, n-3]
    test_draws = {int(sample_frame_indices(10, 1, False,
                                           np.random.default_rng(s))[0])
                  for s in range(50)}
    assert len(test_draws) > 1 and test_draws <= set(range(1, 8))


def test_resize_follows_crop_size(dataset_dir):
    """Shorter-side resize scales with img_size like the reference
    (video_reader.py:96-101: 96 for 84, 256 for 224 — both img_size·256/224)."""
    from litemkd_tpu.data import VideoStore
    args = (str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"), 3, T)
    assert VideoStore(*args, 84).resize_to == 96
    assert VideoStore(*args, 224).resize_to == 256
    assert VideoStore(*args, 224, resize_to=512).resize_to == 512


def test_missing_teacher_feature_raises(dataset_dir, cfg, tmp_path):
    """A video with no feature.npy in a strict teacher store fails loudly
    (the reference crashes on np.load; silently distilling against zeros
    would be worse)."""
    import shutil
    from litemkd_tpu.data import (VideoStore, FeatureStore, EpisodeSampler,
                                  EpisodeSpec)
    feat_root = tmp_path / "multi_feature"
    shutil.copytree(dataset_dir / "multi_feature", feat_root)
    shutil.rmtree(feat_root / "class00" / "vid_00_00")
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    fs = FeatureStore(str(feat_root), str(dataset_dir / "splits"), 3, T, D)
    sampler = EpisodeSampler(cfg, vs, fs, num_workers=0)
    spec = EpisodeSpec([0, 1, 2], [[0, 1]] * 3, [[2, 3]] * 3)  # hits vid_00_00
    with pytest.raises(FileNotFoundError, match="vid_00_00"):
        sampler.sample_batch(np.random.default_rng(0), 1, train=True,
                             specs=[spec])


def test_feature_pairing_keys_on_class_name(dataset_dir, cfg, tmp_path):
    """Feature trees missing a class folder renumber their scan-order class
    ids; video→feature pairing must key on class NAME so later classes still
    match their own features."""
    import shutil
    from litemkd_tpu.data import VideoStore, FeatureStore, EpisodeSampler
    feat_root = tmp_path / "multi_feature"
    shutil.copytree(dataset_dir / "multi_feature", feat_root)
    shutil.rmtree(feat_root / "class00")   # shift every later class's scan id
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    fs = FeatureStore(str(feat_root), str(dataset_dir / "splits"), 3, T, D)
    sampler = EpisodeSampler(cfg, vs, fs, num_workers=0)
    rec = vs.split(True).get(2, 1)          # class02's second train video
    _, feats = sampler._load_one(rec, True, seed=0)
    expected = np.load(feat_root / "class02" / rec.video_id / "feature.npy")
    np.testing.assert_array_equal(feats, expected)


def test_fixed_import_rejects_orphan_query(dataset_dir, tmp_path):
    """A fixed-file query entry whose class has no support entries is an
    error, not a silent drop (the episode the file specifies could not be
    replayed faithfully)."""
    import json
    from litemkd_tpu.data import VideoStore, load_reference_fixed_episodes
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    index = vs.split(False)
    data = {"0": {"support": [{"id": 0, "class_bc": 0, "video_idx": 0}],
                  "query": [{"id": 0, "class_bc": 1,
                             "video_idx": index.n_videos(0)}]}}
    path = tmp_path / "fixed_test.json"
    path.write_text(json.dumps(data))
    with pytest.raises(ValueError, match="no support entries"):
        load_reference_fixed_episodes(str(path), index)
    # and an unknown class id is a clear error, not a KeyError
    data["0"]["query"][0]["class_bc"] = 99
    path.write_text(json.dumps(data))
    with pytest.raises(ValueError, match="does not exist"):
        load_reference_fixed_episodes(str(path), index)


def test_native_zip_decode_matches_file_decode(tmp_path):
    """The in-memory native decoder over zip-held JPEG bytes produces the
    same bytes as the file-path native decoder (and hence, on identity
    resize, as PIL — covered above)."""
    import zipfile
    from litemkd_tpu import native
    from litemkd_tpu.data.video import ZipFrameStore, load_clip_native
    if not native.available() or \
            getattr(native.load(), "clipdec_decode_clip_mem", None) is None:
        pytest.skip("native mem decoder unavailable")
    rng = np.random.default_rng(2)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 255, size=(256, 300, 3), dtype=np.uint8)
        p = tmp_path / f"c0/v0/{i:05d}.jpg"
        p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    zp = str(tmp_path / "z.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        for p in paths:
            zf.write(p, os.path.relpath(p, tmp_path))
    zs = ZipFrameStore(zp)
    zpaths = [os.path.relpath(p, tmp_path) for p in paths]
    idxs = np.arange(3)
    for train, seed in [(False, 0), (True, 3), (True, 4)]:
        a = load_clip_native(paths, idxs, img_size=224, train=train,
                             rng=np.random.default_rng(seed))
        b = load_clip_native(zpaths, idxs, img_size=224, train=train,
                             rng=np.random.default_rng(seed), zip_store=zs)
        assert a is not None and b is not None
        np.testing.assert_array_equal(a, b)


def test_reference_fixed_episode_save_roundtrip(dataset_dir, tmp_path):
    """save_reference_fixed_episodes is the exact inverse of the importer —
    files we generate replay both here and in the reference codebase."""
    from litemkd_tpu.data import (VideoStore, draw_episode_spec,
                                  save_reference_fixed_episodes,
                                  load_reference_fixed_episodes)
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    index = vs.split(False)
    rng = np.random.default_rng(11)
    specs = [draw_episode_spec(index, WAY, SHOT, 1, rng) for _ in range(3)]
    for name in ("fixed.json", "fixed.yaml"):
        path = str(tmp_path / name)
        save_reference_fixed_episodes(specs, index, path)
        back = load_reference_fixed_episodes(path, index)
        assert [s.to_json() for s in back] == [s.to_json() for s in specs], name


def test_episode_sampler_meta(dataset_dir, cfg):
    """return_meta: classes are the spec's real ids in label order and
    real_query_labels == classes[query_labels] after the query shuffle."""
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG)
    sampler = EpisodeSampler(cfg, vs, None, num_workers=0)
    rng = np.random.default_rng(7)
    specs = [draw_episode_spec(vs.test_split, WAY, SHOT, 1, rng)
             for _ in range(2)]
    batch, meta = sampler.sample_batch(rng, 2, train=False, specs=specs,
                                       return_meta=True)
    np.testing.assert_array_equal(meta.classes,
                                  [s.classes for s in specs])
    want = np.take_along_axis(meta.classes, batch.query_labels, axis=-1)
    np.testing.assert_array_equal(meta.real_query_labels, want)


def test_cross_view_sampling(dataset_dir, cfg):
    """--cross_view (reference run.py:142-146, video_reader.py:255-313):
    every QUERY clip comes from views[query_view]; SUPPORT clips come from
    random cameras over ALL views (the released slice-concat at l.268 is a
    no-op, so the query camera is not excluded)."""
    import dataclasses
    ccfg = cfg.replace(data=dataclasses.replace(cfg.data, cross_view=True,
                                                query_view=1))
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG, view_root=str(dataset_dir / "all_view_rgb_l8"))
    assert vs.views == [f"Camera_{k}" for k in range(4)]
    sampler = EpisodeSampler(ccfg, vs, None, num_workers=0)
    batch = sampler.sample_batch(np.random.default_rng(5), 2, train=True)

    def clip_views(clips):
        # constant-color JPEGs decode to (nearly) their source value
        means = clips.reshape(clips.shape[0], clips.shape[1], -1).mean((1, 2))
        out = []
        for m in means:
            dist = [abs(m - v) for v in VIEW_VALUES]
            assert min(dist) < 5.0, f"clip mean {m} matches no view"
            out.append(int(np.argmin(dist)))
        return out

    for e in range(2):
        assert clip_views(batch.query_clips[e]) == [1] * (WAY * QPC)
    support_views = [v for e in range(2)
                     for v in clip_views(batch.support_clips[e])]
    assert len(set(support_views)) >= 2   # random cameras, not one pin

    # --fixed_view pins EVERY clip to the named camera
    fcfg = cfg.replace(data=dataclasses.replace(cfg.data,
                                                fixed_view="Camera_2"))
    sampler = EpisodeSampler(fcfg, vs, None, num_workers=0)
    batch = sampler.sample_batch(np.random.default_rng(6), 1, train=False)
    assert clip_views(batch.support_clips[0]) == [2] * (WAY * SHOT)
    assert clip_views(batch.query_clips[0]) == [2] * WAY


def test_cross_view_guards(dataset_dir, cfg):
    """load_view applies the same image-extension filter / min-frame guard as
    the primary scan (view trees are only listed at load time), and an
    out-of-range --query_view fails with a named error, not an IndexError."""
    import dataclasses
    vs = VideoStore(str(dataset_dir / "rgb_l8"), str(dataset_dir / "splits"),
                    3, T, IMG, view_root=str(dataset_dir / "all_view_rgb_l8"))
    rec = vs.split(True).get(0, 0)
    vdir = (dataset_dir / "all_view_rgb_l8" / "Camera_0"
            / vs.class_names[rec.class_id] / rec.video_id)
    junk = vdir / "thumbs.db"
    junk.write_bytes(b"not a jpeg")
    try:
        clip = vs.load_view(rec, "Camera_0", train=False,
                            rng=np.random.default_rng(0))
        assert abs(clip.reshape(-1).mean() - VIEW_VALUES[0]) < 5.0
    finally:
        junk.unlink()

    short = (dataset_dir / "all_view_rgb_l8" / "Camera_0"
             / vs.class_names[rec.class_id] / "short_vid")
    short.mkdir(parents=True)
    try:
        Image.fromarray(np.full((40, 48, 3), 7, np.uint8)).save(
            short / "00000.jpg")
        short_rec = dataclasses.replace(rec, video_id="short_vid")
        with pytest.raises(ValueError, match="seq_len"):
            vs.load_view(short_rec, "Camera_0", train=False,
                         rng=np.random.default_rng(0))
    finally:
        import shutil
        shutil.rmtree(short)

    ccfg = cfg.replace(data=dataclasses.replace(cfg.data, cross_view=True,
                                                query_view=9))
    sampler = EpisodeSampler(ccfg, vs, None, num_workers=0)
    with pytest.raises(ValueError, match="query_view 9 out of range"):
        sampler.sample_batch(np.random.default_rng(1), 1, train=True)


def test_cross_view_through_build_sampler_and_training(dataset_dir, cfg):
    """build_sampler derives view_root from rgb_path's sibling
    all_view_rgb_l8 tree (cli --cross_view with no --view_root) and
    run_training consumes the cross-view sampler end-to-end."""
    import dataclasses
    from litemkd_tpu.cli.common import build_sampler
    from litemkd_tpu.train import run_training
    from litemkd_tpu.utils import MetricsLogger

    ccfg = cfg.replace(
        # teacher-free expert stage: no feature tree in the fixture's view mode
        model=dataclasses.replace(cfg.model, backbone="resnet18_student",
                                  classifier="TRX"),
        distill=dataclasses.replace(cfg.distill, name="ce"),
        data=dataclasses.replace(
            cfg.data, dataset="hmdb", cross_view=True, query_view=0,
            rgb_path=str(dataset_dir / "rgb_l8"),
            traintestlist=str(dataset_dir / "splits"), num_workers=0),
        train=dataclasses.replace(cfg.train, tasks_per_batch=2,
                                  training_iterations=2, test_iters=(),
                                  checkpoint_dir=None))
    sampler = build_sampler(ccfg, need_teacher=False)
    assert sampler.videos.view_root.endswith("all_view_rgb_l8")
    batch = sampler.sample_batch(np.random.default_rng(0), 1, train=False)
    # queries pinned to Camera_0 (constant pixel 20)
    q = batch.query_clips[0].reshape(WAY, -1).mean(-1)
    assert np.abs(q - VIEW_VALUES[0]).max() < 5.0
    state, _, _ = run_training(ccfg, sampler, MetricsLogger(print_freq=0))
    assert int(state.step) == 1


def test_synthetic_spec_replay():
    """Synthetic sources honor fixed-episode specs: the same (class, video)
    spec always decodes to identical content, so --fixed_episode_file means
    the same thing on synthetic data as on real trees (previously specs were
    silently ignored / rejected)."""
    from litemkd_tpu.data import SyntheticEpisodeSource
    from litemkd_tpu.data.episodes import EpisodeSpec
    from litemkd_tpu.cli.train_teacher import SyntheticMultiModalSource

    base = preset("tiny")
    src = SyntheticEpisodeSource(base, n_classes=6, seed=0)
    spec = EpisodeSpec([0, 2, 4], [[0, 1], [3, 4], [5, 6]], [[2], [0], [1]])

    b1 = src.sample_batch(np.random.default_rng(1), 1, train=False, specs=[spec])
    b2 = src.sample_batch(np.random.default_rng(9), 1, train=False, specs=[spec])
    # different rngs shuffle slot order differently, but the episode's CONTENT
    # (multiset of decoded clips) is identical
    np.testing.assert_array_equal(np.sort(b1.support_clips[0].ravel()),
                                  np.sort(b2.support_clips[0].ravel()))
    np.testing.assert_array_equal(np.sort(b1.query_feats[0].ravel()),
                                  np.sort(b2.query_feats[0].ravel()))
    # and differs from a random draw
    b3 = src.sample_batch(np.random.default_rng(1), 1, train=False)
    assert not np.array_equal(np.sort(b1.support_clips[0].ravel()),
                              np.sort(b3.support_clips[0].ravel()))

    # class id outside the synthetic universe is rejected loudly
    bad = EpisodeSpec([0, 2, 99], [[0], [1], [2]], [[3], [4], [5]])
    with pytest.raises(ValueError, match="99"):
        src.sample_batch(np.random.default_rng(0), 1, train=False, specs=[bad])

    # the multi-modal wrapper forwards specs to every modality source
    mm = SyntheticMultiModalSource(base, n_classes=6, seed=0)
    m1 = mm.sample_batch(np.random.default_rng(3), 1, train=False, specs=[spec])
    m2 = mm.sample_batch(np.random.default_rng(3), 1, train=False, specs=[spec])
    for mod in base.model.modalities:
        np.testing.assert_array_equal(m1.support_clips[mod], m2.support_clips[mod])


def test_prefetcher_close_leaves_queue_empty():
    """close() during active production must leave the queue empty even if a
    blocked q.put lands after the consumer's drain — the producer drains once
    more on exit (a staged device batch left in the dropped queue would stay
    pinned in HBM)."""
    import time
    from litemkd_tpu.data.prefetch import Prefetcher

    for _ in range(20):   # the race window is timing-dependent; hammer it
        f = Prefetcher(lambda i: i + 1, n_batches=1000, depth=1,
                       transfer=lambda b: b)
        it = iter(f)
        assert next(it) >= 1
        f.close()
        f.thread.join(timeout=10.0)
        assert not f.thread.is_alive()
        assert f.q.empty(), "a late put survived close()"


def test_metrics_logger_text_files_per_instance(tmp_path):
    """Each MetricsLogger writes its own .log file: logging.basicConfig is a
    no-op once any root handler exists (a second logger, or absl/jax), which
    silently dropped the announced text log."""
    import logging as pylog
    from litemkd_tpu.utils.logging import MetricsLogger

    pylog.getLogger().addHandler(pylog.NullHandler())  # simulate absl/jax
    a = MetricsLogger(log_dir=str(tmp_path / "a"), run_name="one",
                      print_freq=0)
    import time as _t
    _t.sleep(1.1)   # distinct timestamped filenames
    b = MetricsLogger(log_dir=str(tmp_path / "b"), run_name="two",
                      print_freq=0)
    a.info("alpha line")
    b.info("beta line")
    a.close()
    b.close()
    assert "alpha line" in open(a.text_path).read()
    assert "beta line" in open(b.text_path).read()
    assert "beta line" not in open(a.text_path).read()


def test_metrics_logger_save_artifact(tmp_path):
    """save_artifact mirrors checkpoints into wandb (the reference uploads
    each saved .pt via wandb.save, trainwandb.py:172-180): every file inside
    a checkpoint directory is saved individually relative to the dir's
    parent (wandb.save globs non-recursively, so nested orbax payloads need
    per-file saves), files pass through, upload failures don't raise, and
    it's a no-op without an active run."""
    from litemkd_tpu.utils.logging import MetricsLogger

    class FakeWandb:
        run = object()
        def __init__(self):
            self.calls = []
        def save(self, glob_str, base_path=None):
            self.calls.append((glob_str, base_path))

    log = MetricsLogger(print_freq=0)
    log.save_artifact(str(tmp_path))      # no wandb configured: no-op
    log._wandb = fake = FakeWandb()

    ckpt_dir = tmp_path / "ckpts"
    (ckpt_dir / "42" / "state").mkdir(parents=True)
    (ckpt_dir / "42" / "_METADATA").write_text("m")
    (ckpt_dir / "42" / "state" / "params.bin").write_bytes(b"p")
    log.save_artifact(str(ckpt_dir))
    assert sorted(fake.calls) == [
        (str(ckpt_dir / "42" / "_METADATA"), str(tmp_path)),
        (str(ckpt_dir / "42" / "state" / "params.bin"), str(tmp_path)),
    ]

    f = tmp_path / "model.pt"
    f.write_bytes(b"x")
    log.save_artifact(str(f))
    assert fake.calls[-1] == (str(f), None)

    fake.save = lambda *a, **k: (_ for _ in ()).throw(OSError("offline"))
    log.save_artifact(str(f))             # swallowed, training continues
    log.close()


def test_empty_accuracy_summary_is_quiet():
    """Zero-episode summary returns nan/0 without numpy RuntimeWarnings."""
    import warnings
    from litemkd_tpu.utils.metrics import TestAccuracies

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = TestAccuracies().summary()
    assert s["n_tasks"] == 0 and np.isnan(s["accuracy"])
