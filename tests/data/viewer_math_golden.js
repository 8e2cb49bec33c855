function perspective(fov, asp, near, far) {
  const f = 1/Math.tan(fov/2), nf = 1/(near-far);
  return [f/asp,0,0,0, 0,f,0,0, 0,0,(far+near)*nf,-1, 0,0,2*far*near*nf,0];
}

function mul(a, b) {
  const o = new Array(16).fill(0);
  for (let i=0;i<4;i++) for (let j=0;j<4;j++)
    for (let k=0;k<4;k++) o[j*4+i] += a[k*4+i]*b[j*4+k];
  return o;
}

function lookAt(eye, at, up) {
  const sub=(a,b)=>[a[0]-b[0],a[1]-b[1],a[2]-b[2]];
  const norm=v=>{const l=Math.hypot(...v);return [v[0]/l,v[1]/l,v[2]/l];};
  const cross=(a,b)=>[a[1]*b[2]-a[2]*b[1],a[2]*b[0]-a[0]*b[2],a[0]*b[1]-a[1]*b[0]];
  const dot=(a,b)=>a[0]*b[0]+a[1]*b[1]+a[2]*b[2];
  const z=norm(sub(eye,at)), x=norm(cross(up,z)), y=cross(z,x);
  return [x[0],y[0],z[0],0, x[1],y[1],z[1],0, x[2],y[2],z[2],0,
          -dot(x,eye),-dot(y,eye),-dot(z,eye),1];
}

function cameraMVP() {
  const eye = [
    center[0]+cam.pan[0]+cam.dist*radius*Math.cos(cam.phi)*Math.cos(cam.theta),
    center[1]+cam.pan[1]+cam.dist*radius*Math.cos(cam.phi)*Math.sin(cam.theta),
    center[2]+cam.pan[2]+cam.dist*radius*Math.sin(cam.phi)];
  const at = [center[0]+cam.pan[0], center[1]+cam.pan[1], center[2]+cam.pan[2]];
  const proj = perspective(0.9, canvas.width/canvas.height, 0.01*radius, 100*radius);
  return {mvp: mul(proj, lookAt(eye, at, [0,0,1])), eye, at};
}

function deformedPoint(i, defscale) {
  return [positions[i*3]+defscale*u[i*3],
          positions[i*3+1]+defscale*u[i*3+1],
          positions[i*3+2]+defscale*u[i*3+2]];
}

function direction() {
  const yaw = parseFloat(ui.yaw.value)*Math.PI/180;
  const pitch = parseFloat(ui.pitch.value)*Math.PI/180;
  return [Math.cos(pitch)*Math.cos(yaw), Math.cos(pitch)*Math.sin(yaw),
          Math.sin(pitch)];
}

function pick(e) {
  const {mvp} = cameraMVP();
  const rect = canvas.getBoundingClientRect();
  const mx = (e.clientX-rect.left)/rect.width*2-1;
  const my = 1-(e.clientY-rect.top)/rect.height*2;
  const defscale = Math.pow(10, parseFloat(ui.deform.value));
  let best = -1, bestd = 0.03;
  for (let i=0;i<N;i++) {
    const p = deformedPoint(i, defscale);
    const cx = mvp[0]*p[0]+mvp[4]*p[1]+mvp[8]*p[2]+mvp[12];
    const cy = mvp[1]*p[0]+mvp[5]*p[1]+mvp[9]*p[2]+mvp[13];
    const cw = mvp[3]*p[0]+mvp[7]*p[1]+mvp[11]*p[2]+mvp[15];
    if (cw <= 0) continue;
    const d = Math.hypot(cx/cw-mx, cy/cw-my);
    if (d < bestd) { bestd = d; best = i; } }
  anchor = best;
  ui.anchor.textContent = best >= 0 ? `node ${best}` : "none";
  draw();
}
