"""cfg importer tests: architecture shape of the two bundled models
(SURVEY.md Appendix A.1) and dump/parse round-trip."""

import numpy as np

from modelcompression_tpu.models import (
    ConvLayer, MaxPoolLayer, ReorgLayer, RouteLayer,
    dump_cfg, out_channels, parse_cfg, tiny_yolov2_voc, yolov2_voc,
)


def test_yolov2_structure():
    spec = yolov2_voc()
    convs = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert len(convs) == 23
    assert [l.filters for l in convs] == [
        32, 64, 128, 64, 128, 256, 128, 256, 512, 256, 512, 256, 512,
        1024, 512, 1024, 512, 1024, 1024, 1024, 64, 1024, 125]
    pools = [l for l in spec.layers if isinstance(l, MaxPoolLayer)]
    assert len(pools) == 5 and all(p.stride == 2 for p in pools)
    routes = [(i, l) for i, l in enumerate(spec.layers)
              if isinstance(l, RouteLayer)]
    assert routes[0][1].layers == (16,)   # 26x26x512 passthrough source
    assert routes[1][1].layers == (27, 24)
    reorgs = [l for l in spec.layers if isinstance(l, ReorgLayer)]
    assert len(reorgs) == 1 and reorgs[0].stride == 2
    region = spec.region
    assert region.classes == 20 and region.num == 5
    assert len(region.anchors) == 10
    np.testing.assert_allclose(region.anchors[:2], [1.3221, 1.73145])
    # last conv is the 125-ch linear detection conv
    assert convs[-1].filters == 5 * (5 + 20)
    assert convs[-1].activation == "linear" and not convs[-1].batch_normalize


def test_yolov2_channel_resolution():
    spec = yolov2_voc()
    chans = out_channels(spec)
    convs = {i: l for i, l in enumerate(spec.layers)
             if isinstance(l, ConvLayer)}
    # passthrough route: layer 25 pulls 512 ch from layer 16
    assert chans[25] == 512
    # reorg 26x26x64 -> 13x13x256
    assert chans[27] == 256
    # concat route: 256 + 1024
    assert chans[28] == 1280
    assert convs[29].in_channels == 1280
    assert chans[30] == 125


def test_tiny_structure():
    spec = tiny_yolov2_voc()
    convs = [l for l in spec.layers if isinstance(l, ConvLayer)]
    assert [l.filters for l in convs] == [
        16, 32, 64, 128, 256, 512, 1024, 1024, 125]
    pools = [l for l in spec.layers if isinstance(l, MaxPoolLayer)]
    assert len(pools) == 6
    assert pools[-1].stride == 1 and pools[-1].size == 2
    assert not any(isinstance(l, (RouteLayer, ReorgLayer))
                   for l in spec.layers)
    np.testing.assert_allclose(spec.region.anchors[:2], [1.08, 1.19])


def test_dump_parse_roundtrip():
    for spec in (yolov2_voc(), tiny_yolov2_voc()):
        text = dump_cfg(spec)
        spec2 = parse_cfg(text)
        assert len(spec2.layers) == len(spec.layers)
        for a, b in zip(spec.layers, spec2.layers):
            assert type(a) is type(b)
            if isinstance(a, ConvLayer):
                assert (a.filters, a.size, a.stride, a.batch_normalize,
                        a.activation, a.in_channels) == (
                    b.filters, b.size, b.stride, b.batch_normalize,
                    b.activation, b.in_channels)
            if isinstance(a, RouteLayer):
                assert a.layers == b.layers
        assert spec2.region.anchors == spec.region.anchors
        assert out_channels(spec2) == out_channels(spec)


def test_dump_parse_roundtrip_all_net_fields():
    """EVERY NetConfig field must survive dump->parse (checkpoint arch.cfg
    carries the training hyperparameters; losing burn_in/augment knobs means
    resume trains with defaults)."""
    import dataclasses
    spec = yolov2_voc()
    # make every field distinctive so a silent drop is caught
    spec.net.burn_in = 777
    spec.net.steps = (-1, 100, 20000)
    spec.net.scales = (0.1, 10.0, 0.1)
    spec.net.angle = 7.0
    spec.net.saturation = 1.25
    spec.net.exposure = 1.75
    spec.net.hue = 0.05
    spec.net.subdivisions = 4
    spec.net.max_batches = 1234
    spec2 = parse_cfg(dump_cfg(spec))
    for f in dataclasses.fields(spec.net):
        assert getattr(spec2.net, f.name) == getattr(spec.net, f.name), \
            f"NetConfig.{f.name} did not round-trip"
    # region fields too — fine-tune semantics live here
    for f in dataclasses.fields(spec.region):
        assert getattr(spec2.region, f.name) == getattr(spec.region, f.name)
