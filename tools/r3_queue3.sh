#!/bin/bash
# Round-3 queue 3: slide-mode gate + windowed-path stage profile + (if the
# gate passes we still capture corpus numbers for both modes).
cd /root/repo
set -x
timeout 3600 python tools/slide_probe.py > measurements/r3_slide.log 2>&1; echo "rc=$?" >> measurements/r3_slide.log
timeout 2400 python tools/windowed_profile.py > measurements/r3_windowed_profile.log 2>&1; echo "rc=$?" >> measurements/r3_windowed_profile.log
LAC_LM_WMODE=slide timeout 3600 python tools/lm_corpus_accept.py > measurements/r3_lm_corpus10_slide.log 2>&1; echo "rc=$?" >> measurements/r3_lm_corpus10_slide.log
echo QUEUE3-DONE
