"""Opt-in HF-exact attention-probability dropout (BertConfig.
exact_attn_dropout): eval-identical to the default fused path, and in
training drops entries of the prob tensor (transformers BertSelfAttention
semantics) rather than the context output."""

import jax
import jax.numpy as jnp
import numpy as np

from ecamp_tpu.core.config import BertConfig
from ecamp_tpu.nn.bert import BertSelfAttention

CFG = dict(vocab_size=64, hidden_size=32, num_hidden_layers=1,
           num_attention_heads=4, intermediate_size=64,
           max_position_embeddings=16)


def _io(rng):
    hidden = jnp.asarray(rng.normal(size=(2, 8, 32)), jnp.float32)
    bias = jnp.zeros((2, 1, 1, 8), jnp.float32)
    return hidden, bias


def test_exact_mode_eval_identical_to_default():
    rng = np.random.default_rng(0)
    hidden, bias = _io(rng)
    out = {}
    for exact in (False, True):
        m = BertSelfAttention(BertConfig(**CFG, exact_attn_dropout=exact))
        variables = m.init(jax.random.PRNGKey(0), hidden, bias=bias)
        out[exact] = np.asarray(m.apply(variables, hidden, bias=bias,
                                        deterministic=True))
    np.testing.assert_allclose(out[False], out[True], rtol=1e-6, atol=1e-7)


def test_exact_mode_drops_prob_entries():
    rng = np.random.default_rng(1)
    hidden, bias = _io(rng)
    cfg = BertConfig(**CFG, exact_attn_dropout=True,
                     attention_probs_dropout_prob=0.5)
    m = BertSelfAttention(cfg)
    variables = m.init(jax.random.PRNGKey(0), hidden, bias=bias)
    out, probs = m.apply(variables, hidden, bias=bias, deterministic=False,
                         return_probs=True,
                         rngs={"dropout": jax.random.PRNGKey(3)})
    probs = np.asarray(probs)
    frac_zero = (probs == 0).mean()
    assert 0.4 < frac_zero < 0.6  # rate-0.5 dropout hit the prob tensor
    # kept entries are upscaled rows of a softmax: each original row
    # summed to 1, so dropped+rescaled rows sum to ~2x the kept fraction
    assert probs.max() > 1.0 or probs.sum(-1).max() > 1.0


def test_exact_and_default_train_modes_differ():
    """Same rng: output-dropout and probs-dropout are different
    regularizers (that is the point of the flag)."""
    rng = np.random.default_rng(2)
    hidden, bias = _io(rng)
    outs = {}
    for exact in (False, True):
        cfg = BertConfig(**CFG, exact_attn_dropout=exact,
                         attention_probs_dropout_prob=0.3)
        m = BertSelfAttention(cfg)
        variables = m.init(jax.random.PRNGKey(0), hidden, bias=bias)
        outs[exact] = np.asarray(m.apply(
            variables, hidden, bias=bias, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(4)}))
    assert not np.allclose(outs[False], outs[True])
    assert np.isfinite(outs[True]).all()
