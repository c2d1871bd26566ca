"""Independent torch implementation of the LRP rule algebra for cross-checks.

Mirrors zennit-0.5.1 semantics with torch autograd supplying the vjp — so the
JAX implementation's conv/conv-transpose numerics and rule algebra are checked
against a different framework's kernels.
"""

import torch
import torch.nn.functional as F


def stabilize(z, eps):
    sign = torch.where(z >= 0, 1.0, -1.0)
    return z + sign * eps


def _vjp(fn, x, cotangent):
    x = x.detach().requires_grad_(True)
    z = fn(x)
    (g,) = torch.autograd.grad(z, x, grad_outputs=cotangent)
    return g


def linear_apply(w, b):
    def fn(x):
        return x @ w.T + (b if b is not None else 0.0)
    return fn


def conv_apply(w, b):
    def fn(x):
        return F.conv2d(x, w, b, padding="same")
    return fn


def make_apply_with(kind, w, b):
    base = linear_apply if kind == "linear" else conv_apply

    def apply_with(w_mod, b_mod):
        wm = w_mod(w)
        bm = b_mod(b) if b_mod is not None else None
        return base(wm, bm)

    return apply_with


def epsilon_rule(apply_with, x, R, epsilon=1e-6):
    f = apply_with(lambda p: p, lambda p: p)
    z = f(x)
    s = R / stabilize(z, epsilon)
    return x * _vjp(f, x, s)


def gamma_rule(apply_with, x, R, gamma=0.25, stabilizer=1e-6):
    xp, xn = x.clamp(min=0), x.clamp(max=0)
    gp = lambda p: p + gamma * p.clamp(min=0)
    gn = lambda p: p + gamma * p.clamp(max=0)
    zero = lambda p: torch.zeros_like(p)
    ident = lambda p: p

    f1, f2 = apply_with(gp, gp), apply_with(gn, gn)
    f3, f4 = apply_with(gn, zero), apply_with(gp, zero)
    z1, z2, z3, z4 = f1(xp), f2(xn), f3(xp), f4(xn)
    z_true = apply_with(ident, ident)(x)

    s_pos = R * (z_true > 0) / stabilize(z1 + z2, stabilizer)
    s_neg = R * (z_true < 0) / stabilize(z3 + z4, stabilizer)
    return (
        xp * _vjp(f1, xp, s_pos)
        + xn * _vjp(f2, xn, s_pos)
        + xp * _vjp(f3, xp, s_neg)
        + xn * _vjp(f4, xn, s_neg)
    )


def zplus_rule(apply_with, x, R, stabilizer=1e-6):
    xp, xn = x.clamp(min=0), x.clamp(max=0)
    pos = lambda p: p.clamp(min=0)
    neg = lambda p: p.clamp(max=0)
    zero = lambda p: torch.zeros_like(p)
    f1, f2 = apply_with(pos, pos), apply_with(neg, zero)
    s = R / stabilize(f1(xp) + f2(xn), stabilizer)
    return xp * _vjp(f1, xp, s) + xn * _vjp(f2, xn, s)


def alphabeta_rule(apply_with, x, R, alpha=2.0, beta=1.0, stabilizer=1e-6):
    xp, xn = x.clamp(min=0), x.clamp(max=0)
    pos = lambda p: p.clamp(min=0)
    neg = lambda p: p.clamp(max=0)
    zero = lambda p: torch.zeros_like(p)
    f1, f2 = apply_with(pos, pos), apply_with(neg, zero)
    f3, f4 = apply_with(neg, neg), apply_with(pos, zero)
    s_a = R / stabilize(f1(xp) + f2(xn), stabilizer)
    s_b = R / stabilize(f3(xp) + f4(xn), stabilizer)
    return alpha * (xp * _vjp(f1, xp, s_a) + xn * _vjp(f2, xn, s_a)) - beta * (
        xp * _vjp(f3, xp, s_b) + xn * _vjp(f4, xn, s_b)
    )


def wsquare_rule(apply_with, x, R, stabilizer=1e-6):
    sq = lambda p: p * p
    f = apply_with(sq, sq)
    ones = torch.ones_like(x)
    s = R / stabilize(f(ones), stabilizer)
    return _vjp(f, ones, s)


def flat_rule(apply_with, x, R, stabilizer=1e-6):
    ones_m = lambda p: torch.ones_like(p)
    zero = lambda p: torch.zeros_like(p)
    f = apply_with(ones_m, zero)
    ones = torch.ones_like(x)
    s = R / stabilize(f(ones), stabilizer)
    return _vjp(f, ones, s)


# ---- full-model interpreter oracle -----------------------------------------

RULES = {
    "epsilon": lambda aw, x, R, **kw: epsilon_rule(aw, x, R, kw.get("epsilon", 1e-6)),
    "gamma": lambda aw, x, R, **kw: gamma_rule(aw, x, R, kw.get("gamma", 0.25), kw.get("stabilizer", 1e-6)),
    "zplus": lambda aw, x, R, **kw: zplus_rule(aw, x, R, kw.get("stabilizer", 1e-6)),
    "alphabeta": lambda aw, x, R, **kw: alphabeta_rule(aw, x, R, kw.get("alpha", 2.0), kw.get("beta", 1.0), kw.get("stabilizer", 1e-6)),
    "wsquare": lambda aw, x, R, **kw: wsquare_rule(aw, x, R, kw.get("stabilizer", 1e-6)),
    "flat": lambda aw, x, R, **kw: flat_rule(aw, x, R, kw.get("stabilizer", 1e-6)),
}


def torch_layer_forward(spec, params, x):
    kind = spec.kind
    if kind == "conv":
        p = params[spec.name]
        return F.conv2d(x, torch.tensor(np.array(p["w"])), torch.tensor(np.array(p["b"])), padding="same")
    if kind == "linear":
        p = params[spec.name]
        return x @ torch.tensor(np.array(p["w"])).T + torch.tensor(np.array(p["b"]))
    if kind == "relu":
        return F.relu(x)
    if kind == "maxpool":
        return F.max_pool2d(x, spec.config["kernel"])
    if kind == "flatten":
        return x.reshape(x.shape[0], -1)
    if kind == "dropout":
        return x
    raise ValueError(kind)


import numpy as np  # noqa: E402


def torch_lrp(specs, params, x_np, name_map, class_idx, one_hot=False):
    """Reference-style LRP over the layer list with torch autograd fallbacks."""
    rules_by_name = {n: r for n, r in name_map}
    x = torch.tensor(x_np)
    acts = []
    h = x
    for spec in specs:
        acts.append(h)
        h = torch_layer_forward(spec, params, h)
    logits = h
    mask = torch.zeros_like(logits)
    mask[..., class_idx] = 1.0
    R = mask if one_hot else logits * mask

    for i in range(len(specs) - 1, -1, -1):
        spec = specs[i]
        a_in = acts[i]
        rule = rules_by_name.get(spec.name)
        if rule is not None and spec.kind in ("conv", "linear"):
            rule_name, kw = rule
            p = params[spec.name]
            aw = make_apply_with(
                "conv" if spec.kind == "conv" else "linear",
                torch.tensor(np.array(p["w"])), torch.tensor(np.array(p["b"])),
            )
            R = RULES[rule_name](aw, a_in, R, **kw)
        else:
            R = _vjp(lambda t, s=spec: torch_layer_forward(s, params, t), a_in, R)
    return R.numpy(), logits.detach().numpy()


def zbox_rule(apply_with, x, R, low=-1.0, high=1.0, stabilizer=1e-6):
    l = torch.full_like(x, low)
    h = torch.full_like(x, high)
    pos = lambda p: p.clamp(min=0)
    neg = lambda p: p.clamp(max=0)
    ident = lambda p: p
    f, f_pos, f_neg = apply_with(ident, ident), apply_with(pos, pos), apply_with(neg, neg)
    z = f(x) - f_pos(l) - f_neg(h)
    s = R / stabilize(z, stabilizer)
    return x * _vjp(f, x, s) - l * _vjp(f_pos, l, s) - h * _vjp(f_neg, h, s)
