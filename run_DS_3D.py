"""Uniform domain-decomposition driver (reference CLI surface, run_DS_3D.py).

Usage (identical flags to the reference, utils.py:77-88):
  python run_DS_3D.py --mode=train --model=neuralop --dataset=synthetic \
      --exp_name=synth_neuralop --exp_config=configs/exp_config/neuralop_synthetic.yaml \
      --train_config=configs/train_config/teecnet.yaml
"""

from fast_eng_super_resolution_tpu.runner import main
from fast_eng_super_resolution_tpu.utils.config import parse_args

if __name__ == "__main__":
    main(parse_args())
