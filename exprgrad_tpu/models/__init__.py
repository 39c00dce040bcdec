"""Model zoo: reference network architectures built on the DSL."""

from .xor import xor_mlp, xor_from_scratch
from .mnist import fashion_mnist_cnn
from .gan import mnist_gan
from .autoencoder import conv_autoencoder
from .seq2seq import greedy_decode, tiny_seq2seq
from .seq2seq_serve import Seq2SeqServer
from .transformer import flash_transformer, tiny_transformer
from .mixer import tiny_mixer
from .vit import patchify, tiny_vit
from .rnn import tiny_recurrent_lm
from .rnn_serve import RecurrentServer
from .mobile import mobile_cnn
from .diffusion import (ddpm_sample, ddpm_schedule, diffusion_train_batch,
                        tiny_diffusion)
from .vae import tiny_vae, vae_sample, vae_train_batch
from .serve import FlashLMServer
from .batcher import ContinuousBatcher, Seq2SeqBatcher

__all__ = ["ContinuousBatcher", "Seq2SeqBatcher", "FlashLMServer", "RecurrentServer", "Seq2SeqServer", "conv_autoencoder", "ddpm_sample", "ddpm_schedule", "diffusion_train_batch", "fashion_mnist_cnn", "flash_transformer", "greedy_decode", "mnist_gan", "mobile_cnn", "tiny_mixer", "tiny_vit", "patchify", "tiny_diffusion", "tiny_recurrent_lm", "tiny_seq2seq", "tiny_vae", "vae_sample", "vae_train_batch", "tiny_transformer", "xor_from_scratch", "xor_mlp"]
