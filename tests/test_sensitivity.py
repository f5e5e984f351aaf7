"""Li et al. sensitivity-scheduled pruning surface: per-layer fraction
keep-sets, the prune CLI's --fractions schedule, the sensitivity-scan
tool, and the darknet `partial` backbone extractor."""

import os
import sys

import jax
import numpy as np
import pytest

from modelcompression_tpu.compress import (
    l1_filter_keep_sets_scheduled, repack,
)
from modelcompression_tpu.data.fixtures import make_fake_voc, tiny_region_cfg
from modelcompression_tpu.models import (
    init_params, load_cfg, load_weights, parse_cfg, save_weights,
)
from modelcompression_tpu.models.cfg import ConvLayer

sys.path.insert(0, "tools")


def _model(tmp_path, net=64):
    txt = tiny_region_cfg(num_classes=3, width=net, height=net)
    cfg_path = str(tmp_path / "net.cfg")
    open(cfg_path, "w").write(txt)
    spec = parse_cfg(txt)
    params = init_params(spec, jax.random.key(0))
    wpath = str(tmp_path / "w.weights")
    save_weights(wpath, spec, jax.tree.map(np.asarray, params), seen=0)
    return cfg_path, wpath, spec, params


def test_scheduled_keep_sets(tmp_path):
    _, _, spec, params = _model(tmp_path)
    convs = spec.conv_indices()
    # conv layout of tiny_region_cfg: indices 0,2,4,6,8 prunable, 10 = det
    sched = {convs[0]: 0.5, convs[2]: 0.25}
    keep = l1_filter_keep_sets_scheduled(params, spec, sched)
    f0 = spec.layers[convs[0]].filters
    f2 = spec.layers[convs[2]].filters
    assert len(keep[convs[0]]) == f0 - int(0.5 * f0)
    assert len(keep[convs[2]]) == f2 - int(0.25 * f2)
    # unlisted prunable convs default to keep-all
    for i in convs[:-1]:
        if i not in sched:
            assert len(keep[i]) == spec.layers[i].filters
    # detection conv is protected (never in the keep-set dict)
    assert convs[-1] not in keep
    # and the schedule composes with physical repack
    sspec, sparams = repack(spec, params, {i: np.asarray(k)
                                           for i, k in keep.items()})
    assert sspec.layers[convs[0]].filters == f0 - int(0.5 * f0)
    assert sspec.layers[convs[2]].filters == f2 - int(0.25 * f2)

    with pytest.raises(ValueError, match="not a conv"):
        l1_filter_keep_sets_scheduled(params, spec, {1: 0.5})
    with pytest.raises(ValueError, match="non-prunable"):
        l1_filter_keep_sets_scheduled(params, spec, {convs[-1]: 0.5})


def test_prune_cli_fractions_schedule(tmp_path):
    from modelcompression_tpu.cli import prune
    cfg_path, wpath, spec, _ = _model(tmp_path)
    convs = spec.conv_indices()
    out = str(tmp_path / "sched.weights")
    out_cfg = str(tmp_path / "sched.cfg")
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter",
                     "--fractions", f"{convs[0]}:0.5,{convs[2]}:0.25",
                     "--out", out, "--out-cfg", out_cfg])
    assert rc == 0
    slim = load_cfg(out_cfg)
    sc = [l for l in slim.layers if isinstance(l, ConvLayer)]
    oc = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert sc[0].filters == oc[0].filters // 2
    assert sc[2].filters == oc[2].filters - int(0.25 * oc[2].filters)
    assert sc[1].filters == oc[1].filters  # unlisted: untouched
    load_weights(out, slim)  # weights consistent with rewritten cfg

    # malformed schedules are rejected up front
    rc = prune.main(["--cfg", cfg_path, "--weights", wpath,
                     "--mode", "l1_filter", "--fractions", "0:1.5",
                     "--out", out])
    assert rc == 2


def test_sensitivity_scan_tool(tmp_path, capsys):
    from sensitivity_scan import main as scan_main
    cfg_path, wpath, spec, _ = _model(tmp_path)
    data_cfg = make_fake_voc(str(tmp_path / "d"), n_images=2, image_size=96,
                             seed=13)
    convs = spec.conv_indices()
    rc = scan_main(["--cfg", cfg_path, "--weights", wpath,
                    "--data", data_cfg, "--batch", "2",
                    "--fractions", "0.5",
                    "--layers", f"{convs[0]},{convs[1]}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "baseline mAP@50" in out
    assert f"conv[{convs[0]:>2}]" in out and f"conv[{convs[1]:>2}]" in out


def test_partial_weights_tool(tmp_path, capsys):
    from partial_weights import main as partial_main
    cfg_path, wpath, spec, params = _model(tmp_path)
    out = str(tmp_path / "backbone.conv.3")
    rc = partial_main(["--cfg", cfg_path, "--weights", wpath,
                       "--n-convs", "3", "--out", out])
    assert rc == 0
    assert os.path.exists(out)
    # the backbone file loads via the partial path with exactly 3 convs
    loaded, seen = load_weights(out, spec, partial=True)
    assert len(loaded) == 3 and seen == 0
    k0 = spec.conv_indices()[0]
    np.testing.assert_array_equal(
        np.asarray(loaded[f"conv{k0}"]["w"]),
        np.asarray(params[f"conv{k0}"]["w"]))
    # bad N rejected
    assert partial_main(["--cfg", cfg_path, "--weights", wpath,
                         "--n-convs", "99"]) == 2
