#!/usr/bin/env python3
"""Part-segmentation training driver (reference part-seg/train.py).

    python tasks/partseg.py --preset shapenetpart --dataroot /path/to/data
"""



from sonet_tpu.config import parse_args
from sonet_tpu.train.trainer import Trainer


def main(argv=None):
    cfg = parse_args(argv, preset="shapenetpart")
    trainer = Trainer(cfg)
    # mIoU save threshold (part-seg/train.py:110)
    final = trainer.fit(save_threshold=0.835, visualize_every=5)
    print({"final": final, "best": trainer.best_metric})
    return final


if __name__ == "__main__":
    main()
