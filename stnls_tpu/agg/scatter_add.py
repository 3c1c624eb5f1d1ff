"""NonLocalScatterAdd: scatter-sum into an output video.

API parity with reference lib/stnls/agg/scatter_add.py; compute in
ops.agg.nl_scatter_add with deterministic `.at[].add` scatters replacing
the reference's atomicAdd (scatter_add_kernel.cu:114-139). The output is
left unnormalized like the reference (scatter_add.py:105-107).
"""

from stnls_tpu.utils.config import extract_pairs
from stnls_tpu.ops.agg import nl_scatter_add
from stnls_tpu.agg.utils import ensure_ndim6, ensure_flow_heads, expand_heads


def non_local_scatter_add(vid, weights, flows, ps=7, strideIn=4, strideOut=4,
                          outH=0, outW=0, pt=1, dilation=1,
                          reflect_bounds=True, use_adj=False, itype="float"):
    flows = ensure_flow_heads(flows)
    HD = weights.shape[1]
    vid = ensure_ndim6(vid, HD)
    vid = expand_heads(vid, HD)
    flows = expand_heads(flows, HD)
    out, _ = nl_scatter_add(
        vid, weights, flows, ps=ps, strideIn=strideIn, strideOut=strideOut,
        pt=pt, dilation=dilation, reflect_bounds_=reflect_bounds,
        use_adj=use_adj, itype=itype, outH=outH, outW=outW)
    return out


class NonLocalScatterAdd:

    def __init__(self, ps=7, strideIn=4, strideOut=4, outH=0, outW=0, pt=1,
                 dilation=1, reflect_bounds=True, use_adj=False,
                 itype="float"):
        self.ps = ps
        self.strideIn = strideIn
        self.strideOut = strideOut
        self.outH = outH
        self.outW = outW
        self.pt = pt
        self.dilation = dilation
        self.reflect_bounds = reflect_bounds
        self.use_adj = use_adj
        self.itype = itype

    def __call__(self, vid, weights, flows):
        return non_local_scatter_add(
            vid, weights, flows, self.ps, self.strideIn, self.strideOut,
            self.outH, self.outW, self.pt, self.dilation,
            self.reflect_bounds, self.use_adj, self.itype)

    forward = __call__

    def flops(self, nrefs, chnls_per_head, nheads, k):
        return nrefs * chnls_per_head * nheads * k * (self.ps ** 2) * self.pt


def extract_config(cfg, restrict=True):
    pairs = {"ps": 7, "strideIn": 4, "strideOut": 4, "outH": 0, "outW": 0,
             "pt": 1, "dilation": 1, "reflect_bounds": True,
             "use_adj": False, "itype": "float"}
    return extract_pairs(cfg, pairs, restrict=restrict)


def init(cfg):
    cfg = extract_config(cfg)
    return NonLocalScatterAdd(cfg.ps, cfg.strideIn, cfg.strideOut, cfg.outH,
                              cfg.outW, cfg.pt, cfg.dilation,
                              cfg.reflect_bounds, cfg.use_adj, cfg.itype)
