"""Mount-day parity runbook — ONE command to close BASELINE configs 1-2
the moment /root/reference and/or real KITTI + reference checkpoints appear.

reference: SURVEY.md §0 mandatory action; ROADMAP.md "Blocked on the
reference mount" standing order; VERDICT r3 item 5.

Stages (each skipped loudly when its inputs are absent):

  1. mount-status   — is /root/reference populated? inventory + the
                      torch_ref.py diff checklist (SURVEY §0).
  2. copycheck      — difflib similarity scan of our sources vs the
                      reference's (same threshold, 0.6, as the driver's
                      COPYCHECK) so renamed-copy risk is re-audited the
                      day the mount appears.
  3. convert+eval   — for each --checkpoint NETWORK=PATH.pth.tar: load
                      through the torch->flax converter and run the full
                      Eigen eval CLI (cli/test_disp) against
                      --dataset-dir/--dataset-list; print our metrics
                      next to the reference's published table.

Dry-run (works TODAY, no mount/data needed — proves the runbook):

  python scripts/reference_parity.py --dry-run

builds a synthetic torch fixture checkpoint (tests/torch_ref.py) and a
synthetic KITTI-raw tree (velodyne + calib, same shape as the real one),
then runs stages 1-3 end to end.
"""

from __future__ import annotations

import argparse
import difflib
import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = Path("/root/reference")

# Reference published anchors (SURVEY.md §6 — confidence [C]: recalled
# from the WACV 2020 paper; re-verify against /root/reference/README.md
# the day the mount populates, then replace these with the README table).
PUBLISHED = {
    "abs_rel": 0.081, "sq_rel": None, "rmse": 3.55, "rmse_log": None,
    "a1": 0.92, "a2": None, "a3": None,
}
METRIC_NAMES = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]


def stage_mount_status() -> bool:
    print("== stage 1: reference mount status ==")
    files = sorted(p for p in REFERENCE.rglob("*") if p.is_file()) \
        if REFERENCE.is_dir() else []
    if not files:
        print(f"   {REFERENCE} EMPTY — as every round so far (SURVEY §0). "
              "Stages that need it are skipped.\n")
        return False
    print(f"   POPULATED: {len(files)} files. MANDATORY follow-ups "
          "(SURVEY §0 checklist):")
    for f in files[:40]:
        print(f"     {f.relative_to(REFERENCE)}")
    if len(files) > 40:
        print(f"     ... +{len(files) - 40} more")
    print("""   [ ] re-cite every `path::symbol` docstring citation as file:line
   [ ] diff tests/torch_ref.py vs the real models/*.py (must stay a
       re-statement, not a copy):""")
    for name in ("DispNetS", "DispResNet", "PoseExpNet", "disp_vgg",
                 "FCRN"):
        hits = [f for f in files if name.lower() in f.name.lower()]
        for h in hits:
            print(f"         diff {h} tests/torch_ref.py   # {name}")
    print("   [ ] verify SURVEY §6 published numbers vs README.md and "
          "update PUBLISHED in this script\n")
    return True


def stage_copycheck(threshold: float = 0.6) -> list[dict]:
    print("== stage 2: copy-similarity re-audit ==")
    ref_files = [p for p in REFERENCE.rglob("*.py")] \
        if REFERENCE.is_dir() else []
    if not ref_files:
        print("   no reference sources to compare against — skipped\n")
        return []
    ours = [p for p in REPO.rglob("*.py")
            if "/." not in str(p) and "__pycache__" not in str(p)]
    flagged = []
    for rf in ref_files:
        try:
            rtext = rf.read_text(errors="replace")
        except OSError:
            continue
        for of in ours:
            otext = of.read_text(errors="replace")
            # cheap pre-filter: same basename OR within 2x size
            if of.name != rf.name and not (
                    0.5 < (len(otext) + 1) / (len(rtext) + 1) < 2.0):
                continue
            ratio = difflib.SequenceMatcher(
                None, rtext, otext, autojunk=True).quick_ratio()
            if ratio > threshold:
                ratio = difflib.SequenceMatcher(
                    None, rtext, otext, autojunk=True).ratio()
            if ratio > threshold:
                flagged.append({"ref": str(rf), "ours": str(of),
                                "similarity": round(ratio, 3)})
    print(f"   compared {len(ours)} of our files vs {len(ref_files)} "
          f"reference files; flagged (> {threshold}): {len(flagged)}")
    for f in flagged:
        print(f"     {f['similarity']:.2f}  {f['ours']}  <->  {f['ref']}")
    print()
    return flagged


def run_eigen_eval(network: str, ckpt: Path, dataset_dir: Path,
                   dataset_list: Path, img_height: int, img_width: int,
                   median_scaling: bool, extra: list[str]) -> dict | None:
    from supervised_dispnet_tpu.cli.test_disp import main as test_disp_main

    argv = [
        "--pretrained-dispnet", str(ckpt), "--network", network,
        "--dataset-dir", str(dataset_dir), "--dataset-list",
        str(dataset_list), "--img-height", str(img_height),
        "--img-width", str(img_width), *extra,
    ]
    if median_scaling:
        argv.append("--median-scaling")
    buf = io.StringIO()
    with redirect_stdout(buf):
        test_disp_main(argv)
    out = buf.getvalue()
    print("   " + out.strip().replace("\n", "\n   "))
    try:
        vals = [float(v) for v in out.strip().splitlines()[-1].split()]
        return dict(zip(METRIC_NAMES, vals))
    except (ValueError, IndexError):
        return None


def stage_convert_eval(args) -> int:
    print("== stage 3: convert + Eigen eval parity ==")
    if not args.checkpoint:
        print("   no --checkpoint NETWORK=PATH given — skipped\n")
        return 0
    if not (args.dataset_dir and args.dataset_list):
        print("   --dataset-dir/--dataset-list (KITTI raw + Eigen list) "
              "required for eval — skipped\n")
        return 0
    failures = 0
    for spec in args.checkpoint:
        network, _, path = spec.partition("=")
        if not path:
            print(f"   BAD SPEC {spec!r} (want NETWORK=PATH)")
            failures += 1
            continue
        print(f" - {network}: {path}")
        ours = run_eigen_eval(
            network, Path(path), Path(args.dataset_dir),
            Path(args.dataset_list), args.img_height, args.img_width,
            args.median_scaling,
            ["--classification"] if "class" in network else [])
        if ours is None:
            print("   FAILED to parse metrics")
            failures += 1
            continue
        print(f"   {'metric':<10}{'ours':>10}{'published':>12}{'delta':>10}")
        for m in METRIC_NAMES:
            pub = PUBLISHED.get(m)
            row = f"   {m:<10}{ours[m]:>10.4f}"
            if pub is not None:
                row += f"{pub:>12.4f}{ours[m] - pub:>+10.4f}"
            else:
                row += f"{'—':>12}{'—':>10}"
            print(row)
        print("   (published = SURVEY §6 anchors, confidence [C] until "
              "verified against the reference README)")
    print()
    return failures


def build_dry_run_world(tmp: Path) -> argparse.Namespace:
    """Synthetic checkpoint + KITTI-raw tree so the runbook is provable
    today (same tree shape as tests/test_cli.py::kitti_raw_eval)."""
    import cv2
    import numpy as np
    import torch

    from tests.torch_ref import TorchDispNetS

    torch.manual_seed(0)
    ckpt = tmp / "dispnet_model_best.pth.tar"
    torch.save({"epoch": 1, "state_dict": TorchDispNetS().state_dict()},
               ckpt)

    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    root = tmp / "raw"
    date_dir = root / date
    img_dir = date_dir / drive / "image_02" / "data"
    velo_dir = date_dir / drive / "velodyne_points" / "data"
    img_dir.mkdir(parents=True)
    velo_dir.mkdir(parents=True)
    H, W = 64, 208
    P = np.array([[100.0, 0, W / 2, 0], [0, 100.0, H / 2, 0], [0, 0, 1, 0]])
    (date_dir / "calib_cam_to_cam.txt").write_text(
        "R_rect_00: " + " ".join(map(str, np.eye(3).ravel())) + "\n"
        "P_rect_02: " + " ".join(map(str, P.ravel())))
    R = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=float)
    (date_dir / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, R.ravel())) + "\nT: 0 0 0\n")
    rng = np.random.default_rng(1)
    names = []
    for i in range(2):
        cv2.imwrite(str(img_dir / f"{i:010d}.png"),
                    rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
        pts = np.hstack([rng.uniform(5, 60, (300, 1)),
                         rng.uniform(-6, 6, (300, 1)),
                         rng.uniform(-2, 0.5, (300, 1)),
                         np.ones((300, 1))]).astype(np.float32)
        pts.tofile(velo_dir / f"{i:010d}.bin")
        names.append(f"{date}/{drive}/image_02/data/{i:010d}.png")
    lst = tmp / "test_files.txt"
    lst.write_text("\n".join(names))
    return argparse.Namespace(
        checkpoint=[f"dispnet={ckpt}"], dataset_dir=str(root),
        dataset_list=str(lst), img_height=32, img_width=104,
        median_scaling=True)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--checkpoint", action="append", metavar="NETWORK=PATH",
                    help="reference .pth.tar to convert+eval; repeatable "
                         "(e.g. disp_res_50=dispnet_model_best.pth.tar)")
    ap.add_argument("--dataset-dir", help="KITTI raw root")
    ap.add_argument("--dataset-list", help="test_files_eigen.txt")
    ap.add_argument("--img-height", type=int, default=128)
    ap.add_argument("--img-width", type=int, default=416)
    ap.add_argument("--median-scaling", action="store_true")
    ap.add_argument("--dry-run", action="store_true",
                    help="prove the runbook on synthetic fixtures")
    args = ap.parse_args(argv)

    if args.dry_run:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            world = build_dry_run_world(Path(td))
            world.img_height, world.img_width = 32, 104
            stage_mount_status()
            stage_copycheck()
            failures = stage_convert_eval(world)
        print(json.dumps({"runbook": "dry-run",
                          "ok": failures == 0}))
        sys.exit(1 if failures else 0)

    populated = stage_mount_status()
    flagged = stage_copycheck()
    failures = stage_convert_eval(args)
    print(json.dumps({"runbook": "real", "mount_populated": populated,
                      "copycheck_flagged": len(flagged),
                      "eval_failures": failures}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
