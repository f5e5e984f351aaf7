"""Full-train kill-and-resume (SURVEY.md §5.3/§5.4; VERDICT r1 #7): the
train CLI's --resume must reproduce an uninterrupted run EXACTLY — same
params, optimizer momentum, counters — which requires restoring the full
TrainState (PRNG included) AND fast-forwarding the data stream."""

import jax
import numpy as np

from modelcompression_tpu.data.fixtures import make_fake_voc, tiny_region_cfg
from modelcompression_tpu.data.voc import load_list_dataset, read_data_cfg
from modelcompression_tpu.models import init_params, parse_cfg, save_weights
from modelcompression_tpu.train import BatchLoader
from modelcompression_tpu.utils.checkpoint import (
    latest_checkpoint, load_checkpoint,
)


def test_loader_skip_batches_is_stream_identical(tmp_path):
    """skip_batches(n) must leave the shuffle + multi-scale RNG stream
    bit-identical to having drawn n real batches — including mid-epoch."""
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=6, image_size=96,
                             seed=0)
    samples = load_list_dataset(read_data_cfg(data_cfg)["valid"])

    def make(skip):
        ld = BatchLoader(samples, batch_size=2, net_h=64, net_w=64,
                         max_boxes=6, seed=3, multi_scale=(32, 96),
                         resize_every=2)
        if skip:
            ld.skip_batches(skip)
        return iter(ld)

    it_full = make(0)
    batches_full = [next(it_full) for _ in range(7)]  # crosses epochs (3/ep)
    it_skip = make(5)
    batches_skip = [next(it_skip) for _ in range(2)]
    for (i1, t1), (i2, t2) in zip(batches_full[5:], batches_skip):
        np.testing.assert_array_equal(i1, i2)  # incl. multi-scale size
        np.testing.assert_array_equal(t1, t2)


def _setup_cli(tmp_path):
    txt = tiny_region_cfg(num_classes=3, width=64, height=64)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(txt)
    spec = parse_cfg(txt)
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec,
                 jax.tree.map(np.asarray,
                              init_params(spec, jax.random.key(0))), seen=0)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=6, image_size=96,
                             seed=1)
    return cfg_path, wpath, data_cfg


def _run(cfg_path, wpath, data_cfg, ckdir, steps, resume=False,
         jsonl=None):
    from modelcompression_tpu.cli import train as train_cli
    argv = ["--cfg", cfg_path, "--weights", wpath, "--data", data_cfg,
            "--steps", str(steps), "--batch", "2", "--max-boxes", "8",
            "--checkpoint-dir", ckdir]
    if resume:
        argv.append("--resume")
    if jsonl:
        argv += ["--log-jsonl", jsonl]
    return train_cli.main(argv)


def test_train_cli_kill_and_resume_matches_uninterrupted(tmp_path):
    cfg_path, wpath, data_cfg = _setup_cli(tmp_path)
    ck_a = str(tmp_path / "ck_a")
    ck_b = str(tmp_path / "ck_b")

    # uninterrupted: 4 steps
    assert _run(cfg_path, wpath, data_cfg, ck_a, steps=4) == 0
    # "killed" after 2 steps, then resumed to the same 4 TOTAL steps
    assert _run(cfg_path, wpath, data_cfg, ck_b, steps=2) == 0
    assert _run(cfg_path, wpath, data_cfg, ck_b, steps=4, resume=True) == 0

    la, lb = latest_checkpoint(ck_a), latest_checkpoint(ck_b)
    assert la.endswith("step_00000004") and lb.endswith("step_00000004")
    _, sa, ma = load_checkpoint(la)
    _, sb, mb = load_checkpoint(lb)
    assert int(np.asarray(sa["step"])) == int(np.asarray(sb["step"])) == 4
    assert int(np.asarray(sa["seen"])) == int(np.asarray(sb["seen"])) == 8

    flat_a = jax.tree_util.tree_leaves_with_path(sa["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(sb["params"]))
    assert flat_a
    for path, va in flat_a:
        vb = flat_b[path]
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(vb),
            err_msg=f"params{jax.tree_util.keystr(path)} diverged")
    # optimizer momentum too — a resume that drops it would still pass a
    # params-only check on short runs
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(sa["opt_state"]),
            jax.tree_util.tree_leaves_with_path(sb["opt_state"])):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=f"opt_state{pa}")


def test_train_cli_resume_continues_global_step_numbering(tmp_path):
    """A resumed run's metric stream must continue the GLOBAL step ids,
    not restart at 1 (restarting would duplicate step keys for any JSONL
    consumer and shift --eval-every/--checkpoint-every cadence)."""
    import json
    cfg_path, wpath, data_cfg = _setup_cli(tmp_path)
    ck = str(tmp_path / "ck")
    jl = str(tmp_path / "metrics.jsonl")
    assert _run(cfg_path, wpath, data_cfg, ck, steps=2, jsonl=jl) == 0
    assert _run(cfg_path, wpath, data_cfg, ck, steps=4, resume=True,
                jsonl=jl) == 0
    steps = [json.loads(l)["step"] for l in open(jl)
             if json.loads(l)["prefix"] == "train"]
    # first run logs its final step 2; the resumed run logs 3..4, never
    # a second step-1/2 row
    assert steps == sorted(steps)
    assert steps.count(2) == 1
    assert steps[-1] == 4


def test_train_cli_resume_nothing_to_do(tmp_path):
    cfg_path, wpath, data_cfg = _setup_cli(tmp_path)
    ck = str(tmp_path / "ck")
    assert _run(cfg_path, wpath, data_cfg, ck, steps=2) == 0
    # total already reached -> clean no-op
    assert _run(cfg_path, wpath, data_cfg, ck, steps=2, resume=True) == 0
    assert latest_checkpoint(ck).endswith("step_00000002")


def test_train_cli_resume_requires_ckpt_dir(tmp_path):
    from modelcompression_tpu.cli import train as train_cli
    cfg_path, wpath, data_cfg = _setup_cli(tmp_path)
    rc = train_cli.main(["--cfg", cfg_path, "--weights", wpath,
                         "--data", data_cfg, "--steps", "2", "--batch", "2",
                         "--resume"])
    assert rc == 2
