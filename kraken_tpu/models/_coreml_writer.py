"""
kraken_tpu.models._coreml_writer
~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~

CoreML .mlmodel writer on the protobuf wire format (counterpart of
_coreml.py's reader; layer layout mirrors the reference's per-layer
serializers in kraken/lib/vgsl/layers.py so files written here load in the
reference engine through coremltools and vice versa).
"""
import json
import struct
from typing import Optional, Union

import numpy as np

__all__ = ['write_coreml']

# ------------------------------------------------------------- wire writing


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(fnum: int, value: int) -> bytes:
    return _varint(fnum << 3) + _varint(int(value))


def _field_bytes(fnum: int, payload: bytes) -> bytes:
    return _varint((fnum << 3) | 2) + _varint(len(payload)) + payload


def _field_str(fnum: int, s: str) -> bytes:
    return _field_bytes(fnum, s.encode('utf-8'))


def _field_float(fnum: int, value: float) -> bytes:
    return _varint((fnum << 3) | 5) + struct.pack('<f', value)


def _field_double(fnum: int, value: float) -> bytes:
    return _varint((fnum << 3) | 1) + struct.pack('<d', value)


def _packed_uint64(fnum: int, values) -> bytes:
    payload = b''.join(_varint(int(v)) for v in values)
    return _field_bytes(fnum, payload)


def _weight_params(arr: np.ndarray) -> bytes:
    """WeightParams message with packed float32 values."""
    data = np.ascontiguousarray(arr, dtype='<f4').tobytes()
    return _field_bytes(1, data)


# ------------------------------------------------------------ layer builders

def _layer(name: str, inputs: list[str], outputs: list[str],
           oneof_field: int, body: bytes) -> bytes:
    msg = _field_str(1, name)
    for i in inputs:
        msg += _field_str(2, i)
    for o in outputs:
        msg += _field_str(3, o)
    msg += _field_bytes(oneof_field, body)
    return msg


def _activation_body(kind: str) -> bytes:
    # ActivationParams oneof field numbers
    fields = {'LINEAR': 5, 'RELU': 10, 'LEAKYRELU': 15, 'TANH': 30, 'SIGMOID': 40}
    f = fields[kind]
    if kind == 'LEAKYRELU':
        return _field_bytes(f, _field_float(1, 0.01))
    if kind == 'LINEAR':
        return _field_bytes(f, _field_float(1, 1.0) + _field_float(2, 0.0))
    return _field_bytes(f, b'')


def _custom_body(class_name: str, description: str = '',
                 int_params: Optional[dict] = None,
                 double_params: Optional[dict] = None,
                 weights: Optional[list[np.ndarray]] = None) -> bytes:
    body = _field_str(10, class_name)
    for w in (weights or []):
        body += _field_bytes(20, _weight_params(w))
    for key, val in (int_params or {}).items():
        entry = _field_str(1, key) + _field_bytes(2, _field_varint(30, val))
        body += _field_bytes(30, entry)
    for key, val in (double_params or {}).items():
        entry = _field_str(1, key) + _field_bytes(2, _field_double(10, val))
        body += _field_bytes(30, entry)
    if description:
        body += _field_str(40, description)
    return body


def _lstm_weight_params(w_ih, w_hh, bias=None, peep=None) -> bytes:
    """LSTMWeightParams from torch-convention (i, f, g, o) stacked weights."""
    h = w_hh.shape[1]
    # torch gate order i, f, g, o -> CoreML fields: input=*, forget, blockInput(g), output
    gates_ih = np.split(np.asarray(w_ih), 4)
    gates_hh = np.split(np.asarray(w_hh), 4)
    body = b''
    for field, mat in zip((1, 2, 3, 4), (gates_ih[0], gates_ih[1], gates_ih[2], gates_ih[3])):
        body += _field_bytes(field, _weight_params(mat))
    for field, mat in zip((20, 21, 22, 23), (gates_hh[0], gates_hh[1], gates_hh[2], gates_hh[3])):
        body += _field_bytes(field, _weight_params(mat))
    if bias is not None:
        gates_b = np.split(np.asarray(bias), 4)
        for field, vec in zip((40, 41, 42, 43), gates_b):
            body += _field_bytes(field, _weight_params(vec))
    if peep is not None:
        for field, vec in zip((60, 61, 62), peep):
            body += _field_bytes(field, _weight_params(vec))
    return body


def _lstm_params(has_bias: bool) -> bytes:
    return (_field_varint(10, 1) +          # sequenceOutput
            _field_varint(20, 1 if has_bias else 0) +  # hasBiasVectors
            _field_float(60, 50000.0))      # cellClipThreshold


def _activations(n: int) -> bytes:
    # sigmoid, tanh, tanh — the standard LSTM activation triple
    out = _field_bytes(10 if n == 0 else n, b'')
    return out


def _lstm_activation_triple(field: int) -> bytes:
    sigmoid = _field_bytes(40, b'')
    tanh = _field_bytes(30, b'')
    return (_field_bytes(field, sigmoid) +
            _field_bytes(field, tanh) +
            _field_bytes(field, tanh))


# ------------------------------------------------------------- model writer

def _serialize_layers(prefix: str, names, layer_objs, params: dict,
                      input_name: str, out: list) -> str:
    """Walks the layer tree emitting NeuralNetworkLayer messages; returns the
    final output blob name."""
    from kraken_tpu.nn import layers as L
    from kraken_tpu.pretrain.layers import Wav2Vec2Mask

    current = input_name
    for name, layer in zip(names, layer_objs):
        p = params.get(name, {})
        if isinstance(layer, (L.Series, L.Parallel)):
            current = _serialize_layers(prefix, layer.names, layer.layers, p,
                                        current, out)
            continue
        if isinstance(layer, L.ActConv2D):
            conv_name = f'{name}_conv'
            act_name = f'{name}_act'
            conv_out = name if layer.nl == 's' else conv_name
            w = np.asarray(p['co.weight'])
            body = (_field_varint(1, layer.out_channels) +
                    _field_varint(2, layer.in_channels) +
                    _field_varint(10, 1) +
                    _packed_uint64(20, layer.kernel_size) +
                    _packed_uint64(30, layer.stride) +
                    _packed_uint64(40, layer.dilation) +
                    _field_bytes(51, b'') +            # same padding
                    _field_varint(60, 1 if layer.transposed else 0) +
                    _field_varint(70, 1) +
                    _field_bytes(90, _weight_params(w)) +
                    _field_bytes(91, _weight_params(np.asarray(p['co.bias']))))
            out.append(_layer(conv_name, [current], [conv_out], 100, body))
            from kraken_tpu.nn.layers import _ACTIVATIONS
            act_kind = _ACTIVATIONS[layer.nl][0]
            if act_kind == 'SOFTMAX':
                out.append(_layer(act_name, [conv_name], [name], 175, b''))
            elif act_kind != 'SIGMOID':
                out.append(_layer(act_name, [conv_name], [name], 130,
                                  _activation_body(act_kind)))
            # sigmoid convs keep their logits: the conv output IS the blob
            current = conv_out if layer.nl == 's' else name
        elif isinstance(layer, L.LinSoftmax):
            lin_name = f'{name}_lin'
            body = (_field_varint(1, layer._in) +
                    _field_varint(2, layer.output_size) +
                    _field_varint(10, 1) +
                    _field_bytes(20, _weight_params(np.asarray(p['lin.weight']))) +
                    _field_bytes(21, _weight_params(np.asarray(p['lin.bias']))))
            out.append(_layer(lin_name, [current], [lin_name], 140, body))
            out.append(_layer(f'{name}_softmax', [lin_name], [name], 175, b''))
            current = name
        elif isinstance(layer, L.TransposedSummarizingRNN):
            lstm_in = current
            lstm_name = name
            if layer.transpose:
                # permute y/x before the recurrence (PermuteLayerParams.axis)
                perm_out = f'{name}_transposed'
                out.append(_layer(name, [current], [perm_out], 310,
                                  _packed_uint64(1, (0, 1, 3, 2))))
                lstm_in = perm_out
                lstm_name = perm_out
            has_bias = f'layer.bias_ih_l0' in p
            bias = (np.asarray(p['layer.bias_ih_l0']) + np.asarray(p['layer.bias_hh_l0'])) \
                if has_bias else None
            peep = None
            if layer.legacy == 'ocropy':
                peep = [np.asarray(p['layer.weight_ip_l0']),
                        np.asarray(p['layer.weight_fp_l0']),
                        np.asarray(p['layer.weight_op_l0'])]
            if layer.bidi:
                bias_rev = (np.asarray(p['layer.bias_ih_l0_reverse']) +
                            np.asarray(p['layer.bias_hh_l0_reverse'])) if has_bias else None
                peep_rev = None
                if layer.legacy == 'ocropy':
                    peep_rev = [np.asarray(p['layer.weight_ip_l0_reverse']),
                                np.asarray(p['layer.weight_fp_l0_reverse']),
                                np.asarray(p['layer.weight_op_l0_reverse'])]
                body = (_field_varint(1, layer._in) +
                        _field_varint(2, layer.hidden_size) +
                        _lstm_activation_triple(10) +
                        _lstm_activation_triple(11) +
                        _field_bytes(15, _lstm_params(has_bias)) +
                        _field_bytes(20, _lstm_weight_params(p['layer.weight_ih_l0'],
                                                             p['layer.weight_hh_l0'],
                                                             bias, peep)) +
                        _field_bytes(20, _lstm_weight_params(p['layer.weight_ih_l0_reverse'],
                                                             p['layer.weight_hh_l0_reverse'],
                                                             bias_rev, peep_rev)))
                out.append(_layer(lstm_name, [lstm_in, f'{lstm_name}_h', f'{lstm_name}_c',
                                              f'{lstm_name}_h_rev', f'{lstm_name}_c_rev'],
                                  [lstm_name + '_out', f'{lstm_name}_h_out', f'{lstm_name}_c_out',
                                   f'{lstm_name}_h_rev_out', f'{lstm_name}_c_rev_out'], 430, body))
                current = lstm_name + '_out'
            else:
                body = (_field_varint(1, layer._in) +
                        _field_varint(2, layer.hidden_size) +
                        _lstm_activation_triple(10) +
                        _field_bytes(15, _lstm_params(has_bias)) +
                        _field_bytes(20, _lstm_weight_params(p['layer.weight_ih_l0'],
                                                             p['layer.weight_hh_l0'],
                                                             bias, peep)))
                if layer.direction == 'r':
                    body += _field_varint(100, 1)
                out.append(_layer(lstm_name, [lstm_in, f'{lstm_name}_h', f'{lstm_name}_c'],
                                  [lstm_name + '_out', f'{lstm_name}_h_out', f'{lstm_name}_c_out'],
                                  420, body))
                current = lstm_name + '_out'
        elif isinstance(layer, L.MaxPool):
            body = (_field_varint(1, 0) +                    # MAX
                    _packed_uint64(10, layer.kernel_size) +
                    _packed_uint64(20, layer.stride) +
                    _field_bytes(31, b''))                   # same padding
            out.append(_layer(name, [current], [name], 120, body))
            current = name
        elif isinstance(layer, L.GroupNorm):
            body = _custom_body('groupnorm', 'kraken group normalization custom layer',
                                int_params={'in_channels': layer.in_channels,
                                            'num_groups': layer.num_groups},
                                weights=[np.asarray(p['layer.weight']),
                                         np.asarray(p['layer.bias'])])
            out.append(_layer(name, [current], [name], 500, body))
            current = name
        elif isinstance(layer, L.Dropout):
            body = _custom_body('dropout', 'kraken dropout custom layer',
                                int_params={'dim': layer.dim},
                                double_params={'p': layer.p})
            out.append(_layer(name, [current], [name], 500, body))
            current = name
        elif isinstance(layer, L.Reshape):
            body = _custom_body('reshape', 'kraken reshape custom layer',
                                int_params={'src_dim': layer.src_dim,
                                            'part_a': layer.part_a,
                                            'part_b': layer.part_b,
                                            'high': layer.high,
                                            'low': layer.low})
            out.append(_layer(name, [current], [name], 500, body))
            current = name
        elif isinstance(layer, L.Addition):
            body = _custom_body('addition', 'An addition layer',
                                int_params={'dim': layer.dim,
                                            'chunk_size': layer.chunk_size})
            out.append(_layer(name, [current], [name], 500, body))
            current = name
        elif isinstance(layer, L.Identity):
            body = _custom_body('identity', 'An identity layer')
            out.append(_layer(name, [current], [name], 500, body))
            current = name
        elif isinstance(layer, Wav2Vec2Mask):
            emb_name = f'{name}_wave2vec2_emb'
            body = (_field_varint(1, layer.context_encoder_input_dim) +
                    _field_varint(2, layer.mask_width) +
                    _field_varint(10, 0) +
                    _field_bytes(20, _weight_params(np.asarray(p['mask_emb.weight']))))
            out.append(_layer(emb_name, [current], [emb_name], 150, body))
            lin_name = f'{name}_wave2vec2_lin'
            body = (_field_varint(1, layer.context_encoder_input_dim) +
                    _field_varint(2, layer.final_dim) +
                    _field_varint(10, 1) +
                    _field_bytes(20, _weight_params(np.asarray(p['project_q.weight']))) +
                    _field_bytes(21, _weight_params(np.asarray(p['project_q.bias']))))
            out.append(_layer(lin_name, [current], [lin_name], 140, body))
        else:
            raise ValueError(f'Cannot serialize layer {type(layer).__name__} to CoreML')
    return current


def _feature_description(name: str, shape) -> bytes:
    arr = _packed_uint64(1, [s if s else 0 for s in shape]) + _field_varint(2, 65600)
    ftype = _field_bytes(5, arr)
    return _field_str(1, name) + _field_bytes(3, ftype)


def _ro_mlp_layers(name: str, romlp, out: list) -> None:
    p = romlp.params
    body = (_field_varint(1, romlp.feature_size) +
            _field_varint(2, romlp.hidden_size) +
            _field_varint(10, 1) +
            _field_bytes(20, _weight_params(np.asarray(p['fc1.weight']))) +
            _field_bytes(21, _weight_params(np.asarray(p['fc1.bias']))))
    out.append(_layer(f'{name}_mlp_lin_0', ['input'], [f'{name}_mlp_lin_0'], 140, body))
    out.append(_layer(f'{name}_mlp_lin_0_relu', [f'{name}_mlp_lin_0'],
                      [f'{name}_mlp_lin_0_relu'], 130, _activation_body('RELU')))
    body = (_field_varint(1, romlp.hidden_size) +
            _field_varint(2, 1) +
            _field_varint(10, 1) +
            _field_bytes(20, _weight_params(np.asarray(p['fc2.weight']))) +
            _field_bytes(21, _weight_params(np.asarray(p['fc2.bias']))))
    out.append(_layer(f'{name}_mlp_lin_1', [f'{name}_mlp_lin_0_relu'],
                      [f'{name}_mlp_lin_1'], 140, body))


def write_coreml(models, path: Union[str, 'bytes']) -> None:
    """
    Serializes models into a kraken-compatible CoreML file: the first VGSL
    model becomes the neural network; reading-order models are appended as
    auxiliary layers with an `aux_layers` metadata entry.
    """
    from kraken_tpu.vgsl import VGSLModel

    vgsl_models = [m for m in models if isinstance(m, VGSLModel)]
    aux_models = [m for m in models if type(m).__name__ == 'ROMLP']
    if len(vgsl_models) != 1:
        raise ValueError('CoreML serialization requires exactly one VGSL model '
                         f'(got {len(vgsl_models)}).')
    model = vgsl_models[0]

    layer_msgs: list[bytes] = []
    _serialize_layers('', model.net.names, model.net.layers, model.params,
                      'input', layer_msgs)
    aux_meta = {}
    for i, romlp in enumerate(aux_models):
        name = 'ro_model' if romlp.level == 'baselines' else 'ro_model_regions'
        _ro_mlp_layers(name, romlp, layer_msgs)
        aux_meta[name] = romlp.get_spec(name)

    nn_body = b''.join(_field_bytes(1, m) for m in layer_msgs)

    user_meta = {'vgsl': model.user_metadata.get('vgsl', model.spec),
                 'kraken_meta': json.dumps({**model.user_metadata,
                                            'model_type': (model.model_type[0]
                                                           if model.model_type else 'unknown')},
                                           default=str)}
    if model.codec is not None:
        user_meta['codec'] = json.dumps(model.codec.c2l)
    if aux_meta:
        user_meta['aux_layers'] = json.dumps(aux_meta)

    meta = _field_str(1, 'kraken model')
    for k, v in user_meta.items():
        entry = _field_str(1, k) + _field_str(2, v)
        meta += _field_bytes(100, entry)

    desc = (_field_bytes(1, _feature_description('input', model.input)) +
            _field_bytes(10, _feature_description('output', model.output)) +
            _field_bytes(100, meta))

    doc = (_field_varint(1, 2) +          # specificationVersion
           _field_bytes(2, desc) +
           _field_bytes(500, nn_body))
    with open(path, 'wb') as fp:
        fp.write(doc)
