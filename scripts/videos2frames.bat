@echo off
rem Windows variant of videos2frames.sh: dump frames as frames\<name>\NNNNNN.jpg
set "src_dir=%~1"
if "%src_dir%"=="" set "src_dir=videos"
set "dst_dir=%~2"
if "%dst_dir%"=="" set "dst_dir=frames"
for %%f in ("%src_dir%\*.mp4") do (
  mkdir "%dst_dir%\%%~nf" 2>nul
  ffmpeg -hide_banner -loglevel error -i "%%f" -f image2 "%dst_dir%\%%~nf\%%06d.jpg"
  echo %%~nf done
)
