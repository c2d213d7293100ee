"""Adaptive (latent-routed) domain-decomposition driver (reference CLI
surface, run_ALDS_3D.py): same as run_DS_3D plus encoder+classifier routing
when ``n_clusters > 1`` in the exp config."""

from fast_eng_super_resolution_tpu.runner import main
from fast_eng_super_resolution_tpu.utils.config import parse_args

if __name__ == "__main__":
    main(parse_args())
