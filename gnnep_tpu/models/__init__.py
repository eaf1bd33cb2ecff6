from .alignn import AlignnConfig, init_alignn, alignn_apply, alignn_embed  # noqa: F401
