"""Pre-4.48-transformers BertSelfAttention behavior for the reference's
context-fusion layer.

The reference's module/context_fusion.py:45-53 calls BertSelfAttention
POSITIONALLY with the old HF signature

    (hidden_states, attention_mask, head_mask, encoder_hidden_states,
     encoder_attention_mask, past_key_value, output_attentions)

Installed transformers (>=4.48 attention refactor) dropped
`encoder_attention_mask` from that signature, so the reference's
positional args land in the wrong slots (the extended image mask arrives
as `past_key_values` and crashes). This subclass keeps the modern
class's parameters (query/key/value/dropout — state-dict compatible) and
restores the OLD forward signature and eager semantics: Q from
hidden_states; K/V (and the additive mask) from the encoder side when
cross-attending; softmax -> prob-dropout -> context.
"""

from __future__ import annotations

import math

import torch
from torch import nn
from transformers.models.bert.modeling_bert import BertSelfAttention


class OldBertSelfAttention(BertSelfAttention):
    def _split(self, x: torch.Tensor) -> torch.Tensor:
        b, n, _ = x.shape
        return x.view(b, n, self.num_attention_heads,
                      self.attention_head_size).permute(0, 2, 1, 3)

    def forward(self, hidden_states, attention_mask=None, head_mask=None,
                encoder_hidden_states=None, encoder_attention_mask=None,
                past_key_value=None, output_attentions=False):
        is_cross = encoder_hidden_states is not None
        kv_input = encoder_hidden_states if is_cross else hidden_states
        mask = encoder_attention_mask if is_cross else attention_mask

        q = self._split(self.query(hidden_states))
        k = self._split(self.key(kv_input))
        v = self._split(self.value(kv_input))

        scores = torch.matmul(q, k.transpose(-1, -2))
        scores = scores / math.sqrt(self.attention_head_size)
        if mask is not None:
            scores = scores + mask
        probs = nn.functional.softmax(scores, dim=-1)
        probs_dropped = self.dropout(probs)
        if head_mask is not None:
            probs_dropped = probs_dropped * head_mask

        ctx = torch.matmul(probs_dropped, v).permute(0, 2, 1, 3).contiguous()
        ctx = ctx.view(ctx.shape[0], ctx.shape[1], self.all_head_size)
        return (ctx, probs) if output_attentions else (ctx,)
