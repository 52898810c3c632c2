import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from litemkd_tpu import preset
from litemkd_tpu.models import (Student, Teacher, adaptive_max_pool_2d,
                                ResNetBackbone, make_classifier)


def test_adaptive_max_pool_matches_torch():
    rng = np.random.default_rng(0)
    for (h, w) in [(7, 7), (8, 8), (5, 9)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(adaptive_max_pool_2d(jnp.asarray(x), (4, 4)))
        want = torch.nn.AdaptiveMaxPool2d((4, 4))(
            torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resnet18_backbone_shapes():
    m = ResNetBackbone(depth=18, num_fc=2, out_dim=256,
                       compute_dtype=jnp.float32)
    clips = jnp.zeros((2, 4, 64, 64, 3))
    variables = m.init(jax.random.key(0), clips, train=False)
    out = m.apply(variables, clips, train=False)
    assert set(out) == {"f1", "f2"}
    assert out["f1"].shape == (2, 4, 256)
    # batch_stats collection exists (BN state)
    assert "batch_stats" in variables


def test_resnet_trunk_downsamples_32x():
    m = ResNetBackbone(depth=18, num_fc=0, compute_dtype=jnp.float32)
    clips = jnp.zeros((1, 2, 64, 64, 3))
    variables = m.init(jax.random.key(0), clips, train=False)
    out = m.apply(variables, clips, train=False)
    assert out.shape == (1, 2, 512)


@pytest.fixture(scope="module")
def tiny_cfg():
    return preset("tiny")


def _episode_inputs(cfg, rng):
    ep = cfg.episode
    ctx = rng.normal(size=(ep.n_support, ep.seq_len, ep.img_size, ep.img_size, 3)).astype(np.float32)
    tgt = rng.normal(size=(ep.n_queries(True), ep.seq_len, ep.img_size, ep.img_size, 3)).astype(np.float32)
    labels = rng.permutation(np.repeat(np.arange(ep.way), ep.shot)).astype(np.int32)
    return jnp.asarray(ctx), jnp.asarray(labels), jnp.asarray(tgt)


def test_student_forward_2fcsup(tiny_cfg):
    cfg = tiny_cfg
    rng = np.random.default_rng(0)
    ctx, labels, tgt = _episode_inputs(cfg, rng)
    model = Student(cfg)
    variables = model.init(jax.random.key(0), ctx, labels, tgt, train=False)
    out = model.apply(variables, ctx, labels, tgt, train=False)
    logits = out["logits"]
    assert set(logits) == {"kl", "ce", "sup"}
    assert logits["kl"].shape == (cfg.episode.n_queries(True), cfg.episode.way)
    assert logits["sup"].shape == (cfg.episode.way, cfg.episode.way - 1)
    assert np.isfinite(np.asarray(logits["kl"])).all()


def test_teacher_forward_fixed(tiny_cfg):
    cfg = tiny_cfg
    ep = cfg.episode
    rng = np.random.default_rng(1)
    d = cfg.model.trans_linear_in_dim
    ctx = jnp.asarray(rng.normal(size=(ep.n_support, ep.seq_len, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(ep.n_queries(True), ep.seq_len, d)).astype(np.float32))
    labels = jnp.asarray(rng.permutation(np.repeat(np.arange(ep.way), ep.shot)).astype(np.int32))
    model = Teacher(cfg)
    variables = model.init(jax.random.key(0), ctx, labels, tgt, train=False)
    out = model.apply(variables, ctx, labels, tgt, train=False)
    assert set(out["logits"]) == {"kl", "sup"}


def test_student_train_mode_needs_dropout_rng(tiny_cfg):
    cfg = tiny_cfg
    rng = np.random.default_rng(2)
    ctx, labels, tgt = _episode_inputs(cfg, rng)
    model = Student(cfg)
    variables = model.init(jax.random.key(0), ctx, labels, tgt, train=False)
    out, mutated = model.apply(variables, ctx, labels, tgt, train=True,
                               rngs={"dropout": jax.random.key(1)},
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out["logits"]["kl"])).all()


def test_classifier_registry_builds(tiny_cfg):
    cfg = tiny_cfg
    for name in ["TRX", "TRX_sup", "TRX_2fcsup", "TRX_2fcsup_fixed",
                 "e_dist", "cos", "e_dist_fc2_sup", "e_dist_1fc_sup",
                 "TRX_2fcsup_2", "TRX_2fcsup_2_fixed"]:
        make_classifier(name, cfg)


def test_ctx_classifier_matches_compiled_reference_structure(tiny_cfg):
    """The student registry's CTX head is shipped only as bytecode
    (model/classifiers/__pycache__/CTX.cpython-37.pyc, read via
    tools/pyc_reader.py). Lock the recovered structure: a shared
    TimeTransformer (PE → time-axis encoder → f1 Dense → dropout) feeding a
    frame-level (set_size=1) TCT, → (Q, way) logits."""
    cfg = tiny_cfg
    ep, d = cfg.episode, cfg.model.trans_linear_in_dim
    rng = np.random.default_rng(7)
    ctx = jnp.asarray(rng.normal(size=(ep.n_support, ep.seq_len, d))
                      .astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(ep.n_queries(True), ep.seq_len, d))
                      .astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(ep.way), ep.shot)
                         .astype(np.int32))
    head = make_classifier("CTX", cfg)
    assert head.set_size == 1  # TemporalCrossTransformer_gai: single frames
    variables = head.init(jax.random.key(0), ctx, labels, tgt, False)
    # compiled Time_Transformer.forward ends dropout(f1(encoder(...)))
    tt = variables["params"]["time_trans"]
    assert tt["f1"]["kernel"].shape == (d, d)
    logits = head.apply(variables, ctx, labels, tgt, False)
    assert logits.shape == (ep.n_queries(True), ep.way)
    assert np.isfinite(np.asarray(logits)).all()


def test_use_pallas_reaches_every_tct_head(tiny_cfg):
    """cfg.model.use_pallas must reach EVERY TCT-bearing head — TRX_multi/TRM,
    the STRM classifiers, CTX, and the fusion teachers (it used to be
    forwarded only to TRX subclasses, so the flag was a silent no-op
    everywhere else)."""
    cfg = tiny_cfg.replace(model=tiny_cfg.model.__class__(**{
        **tiny_cfg.model.__dict__, "use_pallas": True, "temp_set": (2, 3)}))
    for name in ("TRX_multi", "TRX", "strmclassifiers", "strm_1fc_sup", "CTX"):
        assert make_classifier(name, cfg).use_pallas, name
    from litemkd_tpu.train.teacher_steps import make_mfm
    for kind in ("mfm", "tsf", "dga", "two_road", "TwoTRXShuffleTime"):
        assert make_mfm(cfg, kind=kind).use_pallas, kind


def test_student_forward_2fcsup_2(tiny_cfg):
    """TRX_2fcsup_2 (recovered from the release's compiled-only classifier —
    the .py was never shipped): shared TCT on both streams + SupportDK on
    BOTH streams. At identical params, kl/ce match TRX_2fcsup's and sup_ce
    matches its sup; sup_kl is stream1's SupportDK. This is the head the
    fc_2_sup_2 distiller consumes, which was unusable before."""
    cfg2 = tiny_cfg.replace(model=tiny_cfg.model.__class__(**{
        **tiny_cfg.model.__dict__, "classifier": "TRX_2fcsup_2"}))
    rng = np.random.default_rng(3)
    ctx, labels, tgt = _episode_inputs(cfg2, rng)
    m2 = Student(cfg2)
    variables = m2.init(jax.random.key(0), ctx, labels, tgt, train=False)
    out2 = m2.apply(variables, ctx, labels, tgt, train=False)["logits"]
    assert set(out2) == {"kl", "ce", "sup_kl", "sup_ce"}
    assert out2["sup_kl"].shape == (cfg2.episode.way, cfg2.episode.way - 1)

    # same params drive TRX_2fcsup (identical tree: one shared TCT)
    out1 = Student(tiny_cfg).apply(variables, ctx, labels, tgt,
                                   train=False)["logits"]
    for a, b in (("kl", "kl"), ("ce", "ce"), ("sup_ce", "sup")):
        np.testing.assert_allclose(np.asarray(out2[a]), np.asarray(out1[b]),
                                   rtol=1e-6, err_msg=a)

    # the fc_2_sup_2 distiller consumes this head end-to-end in a train step
    from litemkd_tpu.train import create_train_state, make_train_step
    from litemkd_tpu.train.steps import EpisodeBatch
    ep = cfg2.episode
    d = cfg2.model.trans_linear_in_dim
    cfg2 = cfg2.replace(distill=cfg2.distill.__class__(name="fc_2_sup_2"))
    batch = EpisodeBatch(
        support_clips=ctx[None], support_labels=labels[None],
        query_clips=tgt[None],
        query_labels=jnp.asarray(np.repeat(np.arange(ep.way),
                                           ep.query_per_class)[None]),
        support_feats=jnp.asarray(rng.standard_normal(
            (1, ep.n_support, ep.seq_len, d)).astype(np.float32)),
        query_feats=jnp.asarray(rng.standard_normal(
            (1, ep.n_queries(True), ep.seq_len, d)).astype(np.float32)),
    )
    state, t_vars = create_train_state(cfg2, jax.random.key(1), batch)
    state, metrics = jax.jit(make_train_step(cfg2))(state, t_vars, batch)
    assert np.isfinite(float(metrics["task_loss"]))


def test_mobilenet_remat_matches_plain():
    """remat=True must be a pure scheduling change: identical forward values
    AND identical gradients to the plain trunk (it unlocks micro_batch>=8 on
    chip by rematerializing each inverted-residual block's activations)."""
    from litemkd_tpu.models.backbones.mobilenet import MobileNetV3Backbone
    clips = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 2, 32, 32, 3)).astype(np.float32))
    outs, grads = [], []
    for remat in (False, True):
        m = MobileNetV3Backbone(variant="small", num_fc=1, out_dim=8,
                                compute_dtype=jnp.float32, remat=remat)
        v = m.init(jax.random.key(0), clips, train=False)

        def loss(params):
            out, _ = m.apply({**v, "params": params}, clips, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        outs.append(m.apply(v, clips, train=False))
        grads.append(jax.grad(loss)(v["params"]))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               rtol=1e-6, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        grads[0], grads[1])


def test_every_registered_name_constructs_and_traces(tiny_cfg):
    """Guard: EVERY name in the two registries (models/student.py:44-104,
    reference model_select.py:167-199) must construct and trace one forward at
    tiny geometry. jax.eval_shape runs all Python/Flax construction and
    __call__ logic without compiling, so the whole sweep stays seconds-fast —
    this is the test that would have caught the round-3 HEAD regression
    (TRXMulti rejecting compute_dtype) instantly."""
    from litemkd_tpu.models.student import (BACKBONES, CLASSIFIERS,
                                            make_backbone, make_classifier)
    cfg = tiny_cfg
    ep, d = cfg.episode, cfg.model.trans_linear_in_dim
    key = jax.random.key(0)

    def fstruct(n):
        return jax.ShapeDtypeStruct((n, ep.seq_len, d), jnp.float32)

    # feature layout per head family (see Student: num_fc=2 trunks emit
    # {'f1','f2'}; the STRM trunk emits {'distance','trx*'})
    two_fc = {"TRX_2fc", "TRX_2fcsup", "TRX_2fcsup_2",
              "e_dist_fc2", "e_dist_fc2_sup"}
    strm_two = {"strm_res18_sup"}
    strm_one = {"strmclassifiers", "strm_res18", "strm_1fc_sup"}
    labels = jax.ShapeDtypeStruct((ep.n_support,), jnp.int32)
    for name in sorted(CLASSIFIERS):
        head = make_classifier(name, cfg)
        if name in two_fc:
            keysets = ("f1", "f2")
        elif name in strm_two:
            keysets = ("distance", "trx1", "trx2")
        elif name in strm_one:
            keysets = ("distance", "trx")
        else:
            keysets = None
        if keysets:
            ctx = {k: fstruct(ep.n_support) for k in keysets}
            tgt = {k: fstruct(ep.n_queries(True)) for k in keysets}
        else:
            ctx, tgt = fstruct(ep.n_support), fstruct(ep.n_queries(True))
        v = jax.eval_shape(
            lambda c, l, t, h=head: h.init(key, c, l, t, False),
            ctx, labels, tgt)
        assert "params" in v or not v, name

    clips = jax.ShapeDtypeStruct((1, 2, ep.img_size, ep.img_size, 3),
                                 jnp.float32)
    skel = jax.ShapeDtypeStruct((1, 2, 17, 3), jnp.float32)
    feats = jax.ShapeDtypeStruct((1, 2, d), jnp.float32)
    for name in sorted(BACKBONES):
        bb = make_backbone(name, cfg)
        x = (skel if name in ("s3d", "skeleton")
             else feats if name == "feature" else clips)
        jax.eval_shape(lambda xx, b=bb: b.init(key, xx, train=False), x)
