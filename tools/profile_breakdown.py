"""Where does the flagship forward go: convs vs GNN blocks (TPU)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import dataclasses
from nextou_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

def main(which='all'):
    from nextou_tpu.models import NexToU
    from nextou_tpu.models.presets import flagship_3d_spec
    from nextou_tpu.models.plain_unet import build_plain_unet_spec
    from nextou_tpu.utils import fast_init
    from nextou_tpu.utils.timing import device_loop_time

    spec = flagship_3d_spec(deep_supervision=False)
    B = 2
    x = jnp.zeros((B, *spec.patch_size, spec.in_channels), jnp.bfloat16)

    def run(name, spec_):
        model = NexToU(spec=spec_, dtype=jnp.bfloat16)
        from nextou_tpu.utils.transfer import device_put_variables
        v = fast_init(model, 0, x, train=False)
        v = device_put_variables(v, jnp.bfloat16)
        dt = device_loop_time(lambda x: model.apply(v, x, train=False), x,
                              n_small=1, n_large=5, repeats=1)
        print(f"{name}: {dt*1e3:.1f} ms/step ({B} patches)", flush=True)
        return dt

    t_full = run("full NexToU", spec) if which in ("all", "full") else 0

    # conv-only (strip all GNN blocks but keep same conv counts)
    enc = tuple(dataclasses.replace(s, gnn=(), n_conv=s.n_conv + (1 if s.gnn else 0)) for s in spec.encoder)
    dec = tuple(dataclasses.replace(s, gnn=(), n_conv=s.n_conv + (1 if s.gnn else 0)) for s in spec.decoder)
    t_conv = (0 if which not in ("all", "conv") else run("conv-only (same conv count)", dataclasses.replace(spec, encoder=enc, decoder=dec)))

    # GNN but swin-only (strip pool graphers)
    enc2 = tuple(dataclasses.replace(s, gnn=tuple(g for g in s.gnn if g.kind == "swin")) for s in spec.encoder)
    dec2 = tuple(dataclasses.replace(s, gnn=tuple(g for g in s.gnn if g.kind == "swin")) for s in spec.decoder)
    t_swin = (0 if which not in ("all", "swin") else run("conv+swin (no pool graphers)", dataclasses.replace(spec, encoder=enc2, decoder=dec2)))

    enc3 = tuple(dataclasses.replace(s, gnn=tuple(g for g in s.gnn if g.kind == "pool")) for s in spec.encoder)
    dec3 = tuple(dataclasses.replace(s, gnn=tuple(g for g in s.gnn if g.kind == "pool")) for s in spec.decoder)
    t_pool = (0 if which not in ("all", "pool") else run("conv+pool (no swin graphers)", dataclasses.replace(spec, encoder=enc3, decoder=dec3)))

    print(f"-> conv {t_conv*1e3:.1f} | swin part {(t_swin-t_conv)*1e3:.1f} | pool part {(t_pool-t_conv)*1e3:.1f} | total {t_full*1e3:.1f}")

main(sys.argv[1] if len(sys.argv) > 1 else "all")
