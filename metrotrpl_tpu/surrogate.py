"""Neural-network surrogate forward model.

TPU-native port of the reference's optional keras surrogate
(reference nn_features.py:6-91): an MLP maps (material params, excitation,
thickness) to multi-exponential decay coefficients; the TRPL curve is then
the multiexp evaluated at the requested delay times. The pre/post-processing
contract is identical: inputs are log10-scaled to (-0.5, 0.5) by stored
scale rows; outputs are unscaled and split into rates/coefficients.

Weights load from an .npz (list of (kernel, bias) pairs) or, if h5py is
available, directly from a keras .h5 file of Dense layers.
"""

import numpy as np
import jax.numpy as jnp


class NeuralNetwork:
    """Drop-in analogue of reference nn_features.NeuralNetwork."""

    def __init__(self):
        self.params = None
        self.model_scales = np.zeros((0,))
        self.has_model = False

    # ---- loading -------------------------------------------------------
    def load_model(self, nn_fname, scales_fname):
        if nn_fname.endswith(".npz"):
            data = np.load(nn_fname, allow_pickle=True)
            n_layers = len([k for k in data.files if k.startswith("kernel")])
            self.params = [
                (jnp.asarray(data[f"kernel{i}"]), jnp.asarray(data[f"bias{i}"]))
                for i in range(n_layers)]
        elif nn_fname.endswith((".h5", ".hdf5")):
            self.params = _load_keras_dense_h5(nn_fname)
        else:
            raise ValueError(f"Unsupported weight format: {nn_fname}")
        self.model_scales = np.load(scales_fname, allow_pickle=True)
        self.has_model = True

    def save_npz(self, fname):
        arrs = {}
        for i, (k, b) in enumerate(self.params):
            arrs[f"kernel{i}"] = np.asarray(k)
            arrs[f"bias{i}"] = np.asarray(b)
        np.savez(fname, **arrs)

    # ---- reference-contract pipeline ------------------------------------
    def preprocess(self, inputs):
        """Scale log10 of all input features to (-0.5, 0.5)
        (reference nn_features.py:32-38)."""
        x = jnp.log10(inputs)
        x = (x - self.model_scales[0]) / self.model_scales[1] - 0.5
        return x

    def apply(self, x):
        """MLP forward pass: Dense+relu hidden layers, linear head."""
        for i, (k, b) in enumerate(self.params):
            x = x @ k + b
            if i < len(self.params) - 1:
                x = jnp.maximum(x, 0.0)
        return x

    def postprocess(self, outputs):
        """Undo output scaling; first half are (negative) rates, second half
        coefficients (reference nn_features.py:54-64)."""
        out = (outputs + 0.5) * self.model_scales[3] + self.model_scales[2]
        half = out.shape[-1] // 2
        rates = -(10.0 ** out[..., :half])
        coefs = 10.0 ** out[..., half:]
        return jnp.concatenate([rates, coefs], axis=-1)

    def predict(self, t_steps, inputs):
        """TRPL prediction at delay times t_steps for feature rows
        ``inputs`` (reference nn_features.py:40-52)."""
        x = self.preprocess(jnp.asarray(inputs))
        coefs = self.postprocess(self.apply(x))[0]
        return multiexp(jnp.asarray(t_steps), coefs)


def multiexp(x, args):
    """f(x) = sum_i a_i * exp(k_i * x) with args = [k_0..k_z, a_0..a_z]
    (reference nn_features.py:66-91)."""
    n = args.shape[-1] // 2
    rates = args[..., :n]
    coefs = args[..., n:]
    return jnp.sum(coefs[..., None, :] * jnp.exp(
        rates[..., None, :] * x[..., :, None]), axis=-1)


def _load_keras_dense_h5(fname):
    """Extract Dense (kernel, bias) pairs from a keras .h5 weight file."""
    import h5py

    params = []
    with h5py.File(fname, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        # keras records the true layer order in the 'layer_names' attr;
        # h5py group iteration is alphabetical, which mis-orders
        # dense_10 before dense_2 once there are 11+ layers
        if "layer_names" in root.attrs:
            names = [n.decode() if isinstance(n, bytes) else str(n)
                     for n in root.attrs["layer_names"]]
            names = [n for n in names if n in root]
        else:
            import re

            def natkey(s):  # dense, dense_1, ..., dense_10 in order
                return [int(p) if p.isdigit() else p
                        for p in re.split(r"(\d+)", s)]
            names = sorted(root.keys(), key=natkey)

        def collect(group):
            found = []
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    found.append((name, np.array(obj)))
            group.visititems(visit)
            return found

        for layer in names:
            datasets = dict(collect(root[layer]))
            kernel = next((v for k, v in datasets.items()
                           if k.endswith("kernel:0") or k.endswith("kernel")),
                          None)
            bias = next((v for k, v in datasets.items()
                         if k.endswith("bias:0") or k.endswith("bias")), None)
            if kernel is not None and bias is not None:
                params.append((jnp.asarray(kernel), jnp.asarray(bias)))
    if not params:
        raise ValueError(f"No Dense layers found in {fname}")
    return params
