"""
Torch CPU reference runner for kraken VGSL models: rebuilds a loaded
kraken_tpu VGSLModel as torch modules (the reference engine's substrate —
kraken runs every network through torch, lib/vgsl/layers.py) and loads the
same weights, giving an architecturally-faithful CPU PyTorch pipeline to
benchmark the TPU path against (BASELINE.md measurement plan step 1: the
reference itself cannot run in this image, so this frozen equivalent is the
baseline).

Covers the layer zoo subset used by the shipped models and the flagship
spec: ActConv2D, GroupNorm, MaxPool, Reshape, Dropout (eval no-op),
LinSoftmax, TransposedSummarizingRNN (bidirectional LSTM). Parameter names
in kraken_tpu state dicts already follow torch conventions, so weights map
1:1.
"""
import numpy as np
import torch


def _t(arr):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(arr, np.float32)))


class TorchVGSLRef(torch.nn.Module):
    """Torch mirror of a kraken_tpu VGSL Series layer tree."""

    def __init__(self, model):
        super().__init__()
        self.meta = list(zip(model.net.names, model.net.layers))
        self.mods = torch.nn.ModuleDict()
        params = model.state_dict()
        for name, layer in self.meta:
            kind = type(layer).__name__
            if kind == 'ActConv2D':
                conv = torch.nn.Conv2d(layer.in_channels, layer.out_channels,
                                       layer.kernel_size, layer.stride,
                                       padding=layer.padding,
                                       dilation=layer.dilation)
                conv.weight.data = _t(params[f'nn.{name}.co.weight'])
                conv.bias.data = _t(params[f'nn.{name}.co.bias'])
                self.mods[name] = conv
            elif kind == 'GroupNorm':
                gn = torch.nn.GroupNorm(layer.num_groups, layer.in_channels,
                                        eps=layer.eps)
                gn.weight.data = _t(params[f'nn.{name}.layer.weight'])
                gn.bias.data = _t(params[f'nn.{name}.layer.bias'])
                self.mods[name] = gn
            elif kind == 'LinSoftmax':
                lin = torch.nn.Linear(layer.input_size, layer.output_size)
                lin.weight.data = _t(params[f'nn.{name}.lin.weight'])
                lin.bias.data = _t(params[f'nn.{name}.lin.bias'])
                self.mods[name] = lin
            elif kind == 'TransposedSummarizingRNN':
                rnn = torch.nn.LSTM(layer.input_size, layer.hidden_size,
                                    bidirectional=layer.bidi, batch_first=True)
                sd = {}
                for sfx in ([''] if not layer.bidi else ['', '_reverse']):
                    for part in ('weight_ih_l0', 'weight_hh_l0',
                                 'bias_ih_l0', 'bias_hh_l0'):
                        key = f'nn.{name}.layer.{part}{sfx}'
                        if key in params:
                            sd[part + sfx] = _t(params[key])
                rnn.load_state_dict(sd, strict=False)
                self.mods[name] = rnn
            elif kind in ('MaxPool', 'Reshape', 'Dropout', 'Identity'):
                pass
            else:
                raise NotImplementedError(f'torch reference for layer {kind}')

    @torch.inference_mode()
    def forward(self, x, seq_lens=None):
        lens = None if seq_lens is None else torch.as_tensor(np.asarray(seq_lens))
        for name, layer in self.meta:
            kind = type(layer).__name__
            if kind == 'ActConv2D':
                x = self.mods[name](x)
                if layer.nl == 'r':
                    x = torch.relu(x)
                elif layer.nl == 't':
                    x = torch.tanh(x)
                # 's' emits logits in the forward pass (reference quirk)
                if lens is not None and not layer.transposed:
                    p, k = layer.padding[1], layer.kernel_size[1]
                    s_, d = layer.stride[1], layer.dilation[1]
                    lens = torch.div(lens + 2 * p - d * (k - 1) - 1, s_,
                                     rounding_mode='floor') + 1
            elif kind == 'GroupNorm':
                if lens is None:
                    x = self.mods[name](x)
                else:
                    # padding-aware per-sample statistics over the valid
                    # width only (reference lib/vgsl/layers.py:977-984)
                    gn = self.mods[name]
                    N, C, H, W = x.shape
                    G = layer.num_groups
                    x32 = x.float().reshape(N, G, C // G, H, W)
                    mask = (torch.arange(W)[None, :] < lens[:, None]).float()
                    m = mask[:, None, None, None, :]
                    count = (C // G) * H * lens.float().clamp(min=1)
                    count = count[:, None, None, None, None]
                    mean = (x32 * m).sum(dim=(2, 3, 4), keepdim=True) / count
                    var = (((x32 - mean) * m) ** 2).sum(dim=(2, 3, 4), keepdim=True) / count
                    normed = (x32 - mean) * torch.rsqrt(var + layer.eps)
                    # zero the padding region before and after the affine,
                    # exactly like the jax layer (output buffer stays zero)
                    normed = (normed * m).reshape(N, C, H, W)
                    y = (normed * gn.weight[None, :, None, None]
                         + gn.bias[None, :, None, None])
                    y = y * mask[:, None, None, :]
                    x = y.to(x.dtype)
            elif kind == 'MaxPool':
                x = torch.nn.functional.max_pool2d(x, layer.kernel_size,
                                                   layer.stride)
                if lens is not None:
                    k, s_ = layer.kernel_size[1], layer.stride[1]
                    lens = torch.div(lens - (k - 1) - 1, s_,
                                     rounding_mode='floor') + 1
            elif kind == 'Dropout':
                pass
            elif kind == 'Reshape':
                # same dimension algebra as the jax layer
                shape = (x.shape[:layer.src_dim] + (layer.part_a, layer.part_b)
                         + x.shape[layer.src_dim + 1:])
                x = x.reshape(shape)
                dest, src_dim = layer.low, layer.src_dim
                if layer.high != src_dim:
                    dest = layer.high
                else:
                    src_dim += 1
                perm = list(range(x.ndim))
                step = 1 if dest > src_dim else -1
                for i in range(src_dim, dest, step):
                    perm[i], perm[i + step] = perm[i + step], perm[i]
                x = x.permute(perm)
                x = x.reshape(x.shape[:dest]
                              + (x.shape[dest] * x.shape[dest + 1],)
                              + x.shape[dest + 2:])
            elif kind == 'LinSoftmax':
                x = x.permute(0, 3, 2, 1)
                x = self.mods[name](x)
                x = x.permute(0, 3, 2, 1)
            elif kind == 'TransposedSummarizingRNN':
                # NCHW -> (H*N, W, C) time-major batch like the jax layer
                h = x.permute(2, 0, 3, 1)
                if layer.transpose:
                    h = h.transpose(0, 2)
                H_, N_, W_, C_ = h.shape
                h = h.reshape(H_ * N_, W_, C_)
                ys, _ = self.mods[name](h)
                ys = ys.reshape(H_, N_, W_, layer.output_size)
                if layer.summarize:
                    ys = ys[:, :, -1:, :]
                if layer.transpose:
                    ys = ys.transpose(0, 2)
                x = ys.permute(1, 3, 0, 2)
            else:  # Identity
                pass
        return x


def propagate_seq_lens(model, seq_lens):
    """Per-layer output-length arithmetic identical to the jax layers."""
    lens = np.asarray(seq_lens, np.float64)
    width = None
    for _, layer in zip(model.net.names, model.net.layers):
        kind = type(layer).__name__
        if kind == 'ActConv2D' and not layer.transposed:
            p = layer.padding[1]
            k, s, d = layer.kernel_size[1], layer.stride[1], layer.dilation[1]
            lens = np.floor((lens + 2 * p - d * (k - 1) - 1) / s + 1)
        elif kind == 'MaxPool':
            k, s = layer.kernel_size[1], layer.stride[1]
            lens = np.floor((lens - (k - 1) - 1) / s + 1)
        # Reshape rescales by (in_w / out_w) which is 1 for the S1(1x0)1,3
        # height collapse; RNN/Dropout/GroupNorm/LinSoftmax pass through
    return lens.astype(np.int32)


def torch_recognizer(model):
    """
    Returns fn(batch: np.ndarray NCHW, seq_lens) -> (probs, labels, confs,
    olens) running the torch reference net with greedy per-frame reductions —
    the same contract as the TPU inference forward
    (kraken_tpu/inference/recognition.py prepare_recognition).
    """
    net = TorchVGSLRef(model).eval()

    def fwd(batch, seq_lens, temperature=1.0):
        with torch.inference_mode():
            logits = net(torch.from_numpy(np.ascontiguousarray(batch, np.float32)),
                         seq_lens)
            probs = torch.softmax(logits.float() / temperature, dim=1).squeeze(2)
            confs, labels = probs.max(dim=1)
        olens = propagate_seq_lens(model, seq_lens)
        return probs.numpy(), labels.numpy(), confs.numpy(), olens

    return fwd
