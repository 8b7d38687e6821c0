"""Minimal pytree NN library: init fns -> param dicts, pure apply fns.

No framework dependency: params are plain nested dicts of ``jnp`` arrays, so
they jit/vmap/shard trivially and checkpoint as msgpack.  Initializer and
layer semantics deliberately mirror the torch layers the reference builds on
(nn.Linear/nn.LSTM/nn.TransformerEncoderLayer) so training dynamics match.
"""

from summarizer_tpu.nn.core import (  # noqa: F401
    linear_init,
    linear,
    layer_norm_init,
    layer_norm,
    embedding_init,
    embedding,
    dropout,
    sinusoid_pos_embed,
)
from summarizer_tpu.nn.rnn import (  # noqa: F401
    lstm_init,
    lstm_apply,
    gru_init,
    gru_apply,
    masked_reverse,
)
from summarizer_tpu.nn.attention import (  # noqa: F401
    mha_init,
    mha_apply,
    encoder_layer_init,
    encoder_layer_apply,
    decoder_layer_init,
    decoder_layer_apply,
)
