"""audio/wire.py — the single definition of the int16 h2d wire format."""

import numpy as np

import jax.numpy as jnp

from ssak_tpu.audio.wire import encode_array, encode_rows, int16_ok, to_device_f32, to_int16


def test_int16_roundtrip_exact_for_pcm():
    """File-sourced audio is int16 PCM scaled by 1/32768: the wire must
    round-trip the ORIGINAL sample words exactly."""
    words = np.array([-32768, -1, 0, 1, 17, 32767], np.int16)
    normalized = words.astype(np.float32) / 32768.0
    assert int16_ok(normalized)
    np.testing.assert_array_equal(to_int16(normalized), words)
    dec = np.asarray(to_device_f32(to_int16(normalized)))
    np.testing.assert_array_equal(dec, normalized)


def test_guard_out_of_range_ships_f32():
    hot = np.array([[0.5, 3.0]], np.float32)  # augmented gain overshoot
    assert not int16_ok(hot)
    assert encode_array(hot).dtype == np.float32
    # one hot row demotes the whole packed batch (mixed dtypes would mean
    # two programs per shape)
    x = encode_rows([np.array([0.1, 0.2], np.float32), np.array([2.0], np.float32)], 2, 4)
    assert x.dtype == np.float32 and x.shape == (2, 4)


def test_encode_rows_pads_and_truncates():
    rows = [np.full(3, 0.25, np.float32), np.full(6, -0.5, np.float32)]
    x = encode_rows(rows, 4, 4)  # W=4 (2 dummy rows), T=4 (row 1 truncated)
    assert x.dtype == np.int16 and x.shape == (4, 4)
    assert x[0, 3] == 0 and (x[2:] == 0).all()
    assert (x[1] == to_int16(np.full(4, -0.5, np.float32))).all()


def test_to_device_f32_passthrough_for_floats():
    f = jnp.asarray([0.25, -0.5], jnp.float32)
    out = to_device_f32(f)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(f))
