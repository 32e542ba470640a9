#!/usr/bin/env bash
# tmux-wrapped training launcher (equivalent of the reference train.sh:1-28):
# interactive model pick, log tee, detached session.
set -euo pipefail

SESSION="ducosy_train"
LOG_DIR="${LOG_DIR:-./logs}"
mkdir -p "$LOG_DIR"

echo "Select target model:"
select TARGET in soft_tissue lung all; do
  [ -n "${TARGET:-}" ] && break
done

TS=$(date +%Y%m%d_%H%M%S)
LOG="$LOG_DIR/train_${TARGET}_${TS}.log"
CMD="python cli/train.py --target_model $TARGET $* 2>&1 | tee $LOG"

if command -v tmux >/dev/null 2>&1; then
  tmux new-session -d -s "$SESSION" "$CMD"
  echo "training started in tmux session '$SESSION' (log: $LOG)"
  echo "attach with: tmux attach -t $SESSION"
else
  echo "tmux not found; running in the foreground (log: $LOG)"
  eval "$CMD"
fi
