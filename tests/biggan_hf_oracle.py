"""Test-local PyTorch transcription of `pytorch_pretrained_biggan`'s forward.

The reference consumes BigGAN-deep through that pip package (reference
models.py:65-86, latent.py:9); the package itself is not installable in this
environment, so this module transcribes its public model code (BigGAN,
Generator, GenBlock, SelfAttn, BigGANBatchNorm — huggingface/
pytorch-pretrained-BigGAN model.py) into a test-local oracle:

- identical module tree / parameter names, so `state_dict()` produces the
  exact HF checkpoint layout (`generator.layers.N.conv_0.weight_orig`,
  `weight_u`/`weight_v` spectral-norm triplets, `bn.running_means` shaped
  [n_stats, C], ...) that weights/convert_biggan.py targets;
- identical arithmetic, including the package's BatchNorm stat combination
  `stats[i]*coef + stats[i+1]*(1-coef)` with `coef, i = modf(truncation/step)`
  (fractional weight on the LOWER grid point) and the channel-drop residual
  `x0[:, :x0.shape[1]//2]`;
- spectral norm through torch's own `nn.utils.spectral_norm`, so the
  converter's eval-time sigma folding (u^T W v) is validated against torch.

Used by tests/test_biggan.py for synthetic-checkpoint numerical parity.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def snconv2d(eps=1e-12, **kwargs):
    return nn.utils.spectral_norm(nn.Conv2d(**kwargs), eps=eps)


def snlinear(eps=1e-12, **kwargs):
    return nn.utils.spectral_norm(nn.Linear(**kwargs), eps=eps)


class SelfAttn(nn.Module):
    """Self attention layer (package SelfAttn)."""

    def __init__(self, in_channels, eps=1e-12):
        super().__init__()
        self.in_channels = in_channels
        self.snconv1x1_theta = snconv2d(in_channels=in_channels,
                                        out_channels=in_channels // 8,
                                        kernel_size=1, bias=False, eps=eps)
        self.snconv1x1_phi = snconv2d(in_channels=in_channels,
                                      out_channels=in_channels // 8,
                                      kernel_size=1, bias=False, eps=eps)
        self.snconv1x1_g = snconv2d(in_channels=in_channels,
                                    out_channels=in_channels // 2,
                                    kernel_size=1, bias=False, eps=eps)
        self.snconv1x1_o_conv = snconv2d(in_channels=in_channels // 2,
                                         out_channels=in_channels,
                                         kernel_size=1, bias=False, eps=eps)
        self.maxpool = nn.MaxPool2d(2, stride=2, padding=0)
        self.softmax = nn.Softmax(dim=-1)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        _, ch, h, w = x.size()
        theta = self.snconv1x1_theta(x).view(-1, ch // 8, h * w)
        phi = self.maxpool(self.snconv1x1_phi(x)).view(-1, ch // 8, h * w // 4)
        attn = self.softmax(torch.bmm(theta.permute(0, 2, 1), phi))
        g = self.maxpool(self.snconv1x1_g(x)).view(-1, ch // 2, h * w // 4)
        attn_g = torch.bmm(g, attn.permute(0, 2, 1)).view(-1, ch // 2, h, w)
        attn_g = self.snconv1x1_o_conv(attn_g)
        return x + self.gamma * attn_g


class BigGANBatchNorm(nn.Module):
    """Package BigGANBatchNorm: pre-computed running stats for n_stats
    truncation values, conditional scale/offset from the cond vector."""

    def __init__(self, num_features, condition_vector_dim=None, n_stats=51,
                 eps=1e-4, conditional=True):
        super().__init__()
        self.num_features = num_features
        self.eps = eps
        self.conditional = conditional
        self.register_buffer("running_means", torch.zeros(n_stats, num_features))
        self.register_buffer("running_vars", torch.ones(n_stats, num_features))
        self.step_size = 1.0 / (n_stats - 1)
        if conditional:
            assert condition_vector_dim is not None
            self.scale = snlinear(in_features=condition_vector_dim,
                                  out_features=num_features, bias=False, eps=eps)
            self.offset = snlinear(in_features=condition_vector_dim,
                                   out_features=num_features, bias=False, eps=eps)
        else:
            self.weight = nn.Parameter(torch.ones(num_features))
            self.bias = nn.Parameter(torch.zeros(num_features))

    def forward(self, x, truncation, condition_vector=None):
        coef, start_idx = math.modf(truncation / self.step_size)
        start_idx = int(start_idx)
        if coef != 0.0:  # interpolate (package convention: coef on the LOWER)
            running_mean = (self.running_means[start_idx] * coef
                            + self.running_means[start_idx + 1] * (1 - coef))
            running_var = (self.running_vars[start_idx] * coef
                           + self.running_vars[start_idx + 1] * (1 - coef))
        else:
            running_mean = self.running_means[start_idx]
            running_var = self.running_vars[start_idx]

        if self.conditional:
            running_mean = running_mean.unsqueeze(0).unsqueeze(-1).unsqueeze(-1)
            running_var = running_var.unsqueeze(0).unsqueeze(-1).unsqueeze(-1)
            weight = 1 + self.scale(condition_vector).unsqueeze(-1).unsqueeze(-1)
            bias = self.offset(condition_vector).unsqueeze(-1).unsqueeze(-1)
            out = ((x - running_mean) / torch.sqrt(running_var + self.eps)
                   * weight + bias)
        else:
            out = F.batch_norm(x, running_mean, running_var, self.weight,
                               self.bias, training=False, momentum=0.0,
                               eps=self.eps)
        return out


class GenBlock(nn.Module):
    def __init__(self, in_size, out_size, condition_vector_dim,
                 reduction_factor=4, up_sample=False, n_stats=51, eps=1e-12):
        super().__init__()
        self.up_sample = up_sample
        self.drop_channels = (in_size != out_size)
        middle_size = in_size // reduction_factor

        self.bn_0 = BigGANBatchNorm(in_size, condition_vector_dim,
                                    n_stats=n_stats, eps=eps, conditional=True)
        self.conv_0 = snconv2d(in_channels=in_size, out_channels=middle_size,
                               kernel_size=1, eps=eps)
        self.bn_1 = BigGANBatchNorm(middle_size, condition_vector_dim,
                                    n_stats=n_stats, eps=eps, conditional=True)
        self.conv_1 = snconv2d(in_channels=middle_size, out_channels=middle_size,
                               kernel_size=3, padding=1, eps=eps)
        self.bn_2 = BigGANBatchNorm(middle_size, condition_vector_dim,
                                    n_stats=n_stats, eps=eps, conditional=True)
        self.conv_2 = snconv2d(in_channels=middle_size, out_channels=middle_size,
                               kernel_size=3, padding=1, eps=eps)
        self.bn_3 = BigGANBatchNorm(middle_size, condition_vector_dim,
                                    n_stats=n_stats, eps=eps, conditional=True)
        self.conv_3 = snconv2d(in_channels=middle_size, out_channels=out_size,
                               kernel_size=1, eps=eps)
        self.relu = nn.ReLU()

    def forward(self, x, cond_vector, truncation):
        x0 = x
        x = self.relu(self.bn_0(x, truncation, cond_vector))
        x = self.conv_0(x)
        x = self.relu(self.bn_1(x, truncation, cond_vector))
        if self.up_sample:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = self.conv_1(x)
        x = self.relu(self.bn_2(x, truncation, cond_vector))
        x = self.conv_2(x)
        x = self.relu(self.bn_3(x, truncation, cond_vector))
        x = self.conv_3(x)

        if self.drop_channels:
            new_channels = x0.shape[1] // 2
            x0 = x0[:, :new_channels, ...]
        if self.up_sample:
            x0 = F.interpolate(x0, scale_factor=2, mode="nearest")
        return x + x0


class Generator(nn.Module):
    def __init__(self, config):
        super().__init__()
        self.config = config
        ch = config.channel_width
        condition_vector_dim = config.z_dim * 2

        self.gen_z = snlinear(in_features=condition_vector_dim,
                              out_features=4 * 4 * config.layers[0][1] * ch,
                              eps=config.eps)
        layers = []
        for i, layer in enumerate(config.layers):
            if i == config.attention_layer_position:
                layers.append(SelfAttn(ch * layer[1], eps=config.eps))
            layers.append(GenBlock(ch * layer[1], ch * layer[2],
                                   condition_vector_dim,
                                   up_sample=layer[0],
                                   n_stats=config.n_stats,
                                   eps=config.eps))
        self.layers = nn.ModuleList(layers)

        self.bn = BigGANBatchNorm(ch * config.layers[-1][2],
                                  n_stats=config.n_stats,
                                  eps=config.eps, conditional=False)
        self.relu = nn.ReLU()
        self.conv_to_rgb = snconv2d(in_channels=ch * config.layers[-1][2],
                                    out_channels=ch * config.layers[-1][2],
                                    kernel_size=3, padding=1, eps=config.eps)
        self.tanh = nn.Tanh()

    def forward(self, cond_vector, truncation):
        z = self.gen_z(cond_vector)
        # package: view NHWC then permute to NCHW (TF weight heritage)
        z = z.view(-1, 4, 4, self.config.layers[0][1]
                   * self.config.channel_width)
        z = z.permute(0, 3, 1, 2).contiguous()
        for layer in self.layers:
            if isinstance(layer, GenBlock):
                z = layer(z, cond_vector, truncation)
            else:
                z = layer(z)
        z = self.bn(z, truncation)
        z = self.relu(z)
        z = self.conv_to_rgb(z)
        z = z[:, :3, ...]
        return self.tanh(z)


class BigGAN(nn.Module):
    """Package top-level: class embedding (plain Linear) + generator."""

    def __init__(self, config):
        super().__init__()
        self.config = config
        self.embeddings = nn.Linear(config.num_classes, config.z_dim, bias=False)
        self.generator = Generator(config)

    def forward(self, z, class_label, truncation):
        assert 0 < truncation <= 1
        embed = self.embeddings(class_label)
        cond_vector = torch.cat((z, embed), dim=1)
        return self.generator(cond_vector, truncation)


def build_oracle(state_dict, cfg):
    """Build the oracle from a REAL `pytorch_pretrained_biggan` checkpoint
    state dict (the module tree reproduces the package's names exactly, so
    `load_state_dict` is a strict 1:1 load). Used by
    scripts/validate_pretrained.py for true-checkpoint parity."""
    model = BigGAN(cfg)
    model.load_state_dict(state_dict)
    model.eval()
    return model


def make_random_oracle(cfg, seed=0, power_iterations=3):
    """Build the oracle with randomized parameters AND running stats, settle
    the spectral-norm u/v vectors with a few train-mode power iterations, and
    return it in eval mode (the from_pretrained posture)."""
    torch.manual_seed(seed)
    model = BigGAN(cfg)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("gamma"):
                p.copy_(torch.rand(()) * 0.5 + 0.25)  # nonzero: exercise attn
            else:
                p.normal_(0.0, 0.05 if "weight_orig" in name or "weight" in name
                          else 0.02)
        for name, b in model.named_buffers():
            if name.endswith("running_means"):
                b.normal_(0.0, 0.1)
            elif name.endswith("running_vars"):
                b.uniform_(0.5, 1.5)
    # settle u/v (train-mode forwards run power iterations in-place)
    model.train()
    bsz = 2
    z = torch.randn(bsz, cfg.z_dim)
    cl = torch.softmax(torch.randn(bsz, cfg.num_classes), dim=1)
    with torch.no_grad():
        for _ in range(power_iterations):
            model(z, cl, 1.0)
    model.eval()
    return model
