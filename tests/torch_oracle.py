"""Independent torch-CPU oracle implementing the reference models' math.

torch_geometric is not installed here, so these re-state the reference
operators (NNConv_old /root/reference/models/model.py:521-536, KernelConv
model.py:421-445) directly with torch index_select / index_add, replicating
PyG ``MessagePassing(aggr='mean', flow='source_to_target')`` semantics:
messages from edge_index[0] (source) aggregated at edge_index[1] (target),
mean over incoming edge count, zero for isolated nodes.

Used only by tests as a float64-capable golden reference for the shipped
checkpoints (logs/models/collection_duct_*/partition_0.pth).
"""

import numpy as np
import torch


def _linear(sd, prefix, x):
    w = torch.as_tensor(np.asarray(sd[f"{prefix}.weight"]), dtype=x.dtype)
    b = torch.as_tensor(np.asarray(sd[f"{prefix}.bias"]), dtype=x.dtype)
    return x @ w.T + b


def _scatter_mean(msg, index, n):
    out = torch.zeros((n, msg.shape[1]), dtype=msg.dtype)
    out.index_add_(0, index, msg)
    count = torch.zeros(n, dtype=msg.dtype)
    count.index_add_(0, index, torch.ones(index.shape[0], dtype=msg.dtype))
    return out / count.clamp(min=1.0).unsqueeze(1)


def kernelnn_forward(sd, x, edge_index, edge_attr, depth, dtype=torch.float64):
    """KernelNN forward (model.py:555-562) from a raw state_dict."""
    x = torch.as_tensor(x, dtype=dtype)
    edge_attr = torch.as_tensor(edge_attr, dtype=dtype)
    src = torch.as_tensor(edge_index[0], dtype=torch.long)
    dst = torch.as_tensor(edge_index[1], dtype=torch.long)
    n = x.shape[0]
    width = np.asarray(sd["conv1.root"]).shape[0]

    h = _linear(sd, "fc1", x)
    root = torch.as_tensor(np.asarray(sd["conv1.root"]), dtype=dtype)
    bias = torch.as_tensor(np.asarray(sd["conv1.bias"]), dtype=dtype)

    # DenseNet([ker_in, kw, kw, width**2], ReLU): Linear/ReLU/Linear/ReLU/Linear
    def edge_kernel(e):
        hdn = torch.relu(_linear(sd, "conv1.nn.layers.0", e))
        hdn = torch.relu(_linear(sd, "conv1.nn.layers.2", hdn))
        return _linear(sd, "conv1.nn.layers.4", hdn)

    for _ in range(depth):
        w_e = edge_kernel(edge_attr).view(-1, width, width)
        msg = torch.bmm(h[src].unsqueeze(1), w_e).squeeze(1)
        aggr = _scatter_mean(msg, dst, n)
        h = torch.relu(aggr + h @ root + bias)
    return _linear(sd, "fc2", h).numpy()


def teecnet_forward(sd, x, edge_index, edge_attr, num_layers, dtype=torch.float64):
    """TEECNet forward (model.py:278-286) from a raw state_dict."""
    x = torch.as_tensor(x, dtype=dtype)
    edge_attr = torch.as_tensor(edge_attr, dtype=dtype)
    src = torch.as_tensor(edge_index[0], dtype=torch.long)
    dst = torch.as_tensor(edge_index[1], dtype=torch.long)
    n = x.shape[0]
    width = np.asarray(sd["kernel.root_param"]).shape[0]

    h = _linear(sd, "fc1", x)
    root = torch.as_tensor(np.asarray(sd["kernel.root_param"]), dtype=dtype)
    bias = torch.as_tensor(np.asarray(sd["kernel.bias"]), dtype=dtype)
    lrelu = torch.nn.functional.leaky_relu

    def op_kernel(e):  # DenseNet([1,32,64,128,w^2], LeakyReLU), model.py:403
        hdn = lrelu(_linear(sd, "kernel.operator_kernel.layers.0", e))
        hdn = lrelu(_linear(sd, "kernel.operator_kernel.layers.2", hdn))
        hdn = lrelu(_linear(sd, "kernel.operator_kernel.layers.4", hdn))
        return _linear(sd, "kernel.operator_kernel.layers.6", hdn)

    for _ in range(num_layers):
        w_e = op_kernel(edge_attr).view(-1, width, width)
        xj = _linear(sd, "kernel.linear", h[src])
        msg = torch.bmm(xj.unsqueeze(1), w_e).squeeze(1)
        aggr = _scatter_mean(msg, dst, n)
        h = aggr + h @ root + bias  # no nonlinearity between layers (model.py:280-282)
    return _linear(sd, "fc_out", h).numpy()
