"""Compute kernels: mel frontend, attention, RoPE, KV cache, sampling, quant."""
