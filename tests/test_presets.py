"""Preset serialization (utils.presets): JSON round-trip of configured
processors/chains + learned normalized parameters, with render parity."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasp_tpu.modules import (
    Chain,
    Compressor,
    Gain,
    NoiseShapedReverb,
    ParametricEQ,
    Processor,
)
from dasp_tpu.utils import load_preset, save_preset
from dasp_tpu.utils.presets import processor_from_config, processor_to_config

SR = 44100


@pytest.fixture()
def x():
    return jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 1, 4096)).astype(np.float32) * 0.2
    )


def test_simple_roundtrip_render_parity(tmp_path, x):
    proc = Gain(SR, min_gain_db=-12.0, max_gain_db=6.0)
    params = np.array([[0.3], [0.9]], np.float32)
    p = str(tmp_path / "gain.json")
    save_preset(p, proc, params, metadata={"note": "unit test"})
    proc2, params2 = load_preset(p)
    assert isinstance(proc2, Gain)
    assert proc2.param_ranges == proc.param_ranges  # custom range survived
    y1 = proc.process_normalized(x, jnp.asarray(params))
    y2 = proc2.process_normalized(x, jnp.asarray(params2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-7)


def test_chain_roundtrip_with_stochastic_member(tmp_path, x):
    chain = Chain([
        ParametricEQ(SR, filter_method="block"),
        Compressor(SR, smoother="parallel"),
        NoiseShapedReverb(SR, num_samples=2048),
        Gain(SR),
    ])
    params = np.random.default_rng(0).uniform(0.2, 0.8,
                                              (2, chain.num_params)).astype(np.float32)
    p = str(tmp_path / "chain.json")
    save_preset(p, chain, params)
    chain2, params2 = load_preset(p)
    assert isinstance(chain2, Chain) and chain2.num_params == chain.num_params
    # nested constructor config survived (filter_method / smoother / size)
    assert chain2.processors[0]._init_spec[2]["filter_method"] == "block"
    assert chain2.processors[2]._init_spec[2]["num_samples"] == 2048
    key = jax.random.PRNGKey(7)
    y1 = chain.process_normalized(x, jnp.asarray(params), key=key)
    y2 = chain2.process_normalized(x, jnp.asarray(params2), key=key)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_denormalized_view_is_human_readable(tmp_path):
    proc = Gain(SR, min_gain_db=-24.0, max_gain_db=24.0)
    p = str(tmp_path / "g.json")
    save_preset(p, proc, np.array([0.5], np.float32))
    doc = json.loads(open(p).read())
    assert doc["param_names"] == ["gain_db"]
    assert doc["params_denormalized"][0]["gain_db"] == pytest.approx(0.0)
    assert doc["sample_rate"] == SR


def test_1d_params_and_column_validation(tmp_path):
    proc = Compressor(SR)
    p = str(tmp_path / "c.json")
    save_preset(p, proc, np.full((proc.num_params,), 0.5, np.float32))
    _, params = load_preset(p)
    assert params.shape == (1, proc.num_params)
    with pytest.raises(ValueError, match="columns"):
        save_preset(p, proc, np.zeros((1, proc.num_params + 1), np.float32))


def test_unserializable_constructor_arg_raises(tmp_path):
    proc = NoiseShapedReverb(SR, num_samples=1024, ir_conv_fn=lambda x, ir: x)
    with pytest.raises(TypeError, match="ir_conv_fn"):
        save_preset(str(tmp_path / "r.json"), proc)


def test_unknown_type_and_extra_types(tmp_path):
    class MyGain(Gain):
        pass

    cfg = processor_to_config(MyGain(SR))
    with pytest.raises(KeyError, match="MyGain"):
        processor_from_config(cfg)
    proc = processor_from_config(cfg, extra_types=[MyGain])
    assert isinstance(proc, MyGain)


def test_bad_format_rejected(tmp_path):
    p = str(tmp_path / "junk.json")
    with open(p, "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError, match="not a dasp_tpu preset"):
        load_preset(p)
