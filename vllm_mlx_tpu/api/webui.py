# SPDX-License-Identifier: Apache-2.0
"""Built-in browser chat UI served at ``GET /ui``.

The reference ships two Gradio apps (``gradio_app.py`` chat UI,
``gradio_text_app.py`` text completion UI, entry points
``vllm-mlx-chat``/``vllm-mlx-text-chat``). This rebuild serves an
equivalent zero-dependency single-page UI straight from the aiohttp
server: chat and raw-completion modes, SSE streaming, temperature /
max-tokens controls, and model selection from ``/v1/models`` — no
Gradio (not in the image) and no extra process.
"""

CHAT_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>vllm_mlx_tpu chat</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;background:#111;color:#eee;
      display:flex;flex-direction:column;height:100vh}
 header{padding:10px 16px;background:#1b1b1f;display:flex;gap:12px;
        align-items:center;flex-wrap:wrap}
 header h1{font-size:16px;margin:0 12px 0 0}
 select,input[type=number]{background:#2a2a30;color:#eee;border:1px solid #444;
        border-radius:6px;padding:4px 8px}
 label{font-size:12px;color:#aaa}
 #log{flex:1;overflow-y:auto;padding:16px;display:flex;
      flex-direction:column;gap:10px}
 .msg{max-width:72ch;padding:10px 14px;border-radius:10px;
      white-space:pre-wrap;line-height:1.45}
 .user{background:#2b3a55;align-self:flex-end}
 .assistant{background:#23232a;align-self:flex-start}
 .think{color:#888;font-style:italic;font-size:13px}
 footer{padding:12px 16px;background:#1b1b1f;display:flex;gap:8px}
 textarea{flex:1;background:#2a2a30;color:#eee;border:1px solid #444;
        border-radius:8px;padding:8px;resize:none;font:inherit}
 button{background:#3b6cd4;border:0;color:#fff;border-radius:8px;
        padding:0 18px;cursor:pointer}
 button:disabled{background:#555}
</style></head><body>
<header>
 <h1>vllm_mlx_tpu</h1>
 <label>model <select id="model"></select></label>
 <label>mode <select id="mode">
   <option value="chat">chat</option>
   <option value="text">text completion</option></select></label>
 <label>temp <input id="temp" type="number" value="0.7" step="0.1"
   min="0" max="2" style="width:4em"></label>
 <label>max tokens <input id="maxtok" type="number" value="512"
   min="1" style="width:5em"></label>
 <button id="clear" type="button">clear</button>
</header>
<div id="log"></div>
<footer>
 <textarea id="input" rows="2"
   placeholder="Message (Enter to send, Shift+Enter for newline)"></textarea>
 <button id="send">send</button>
</footer>
<script>
const log=document.getElementById('log'),inp=document.getElementById('input'),
 send=document.getElementById('send');
let history=[];
fetch('/v1/models').then(r=>r.json()).then(d=>{
 for(const m of d.data||[]){const o=document.createElement('option');
  o.value=o.textContent=m.id;document.getElementById('model').add(o);}});
document.getElementById('clear').onclick=()=>{history=[];log.innerHTML='';};
function bubble(cls){const d=document.createElement('div');
 d.className='msg '+cls;log.appendChild(d);
 log.scrollTop=log.scrollHeight;return d;}
async function go(){
 const text=inp.value.trim();if(!text||send.disabled)return;
 inp.value='';send.disabled=true;
 const model=document.getElementById('model').value,
  mode=document.getElementById('mode').value,
  temp=parseFloat(document.getElementById('temp').value),
  maxtok=parseInt(document.getElementById('maxtok').value);
 bubble('user').textContent=text;
 const out=bubble('assistant');out.textContent='\\u2026';
 let url,body;
 if(mode==='chat'){history.push({role:'user',content:text});
  url='/v1/chat/completions';
  body={model,messages:history,temperature:temp,max_tokens:maxtok,stream:true};
 }else{url='/v1/completions';
  body={model,prompt:text,temperature:temp,max_tokens:maxtok,stream:true};}
 let acc='';
 try{
  const r=await fetch(url,{method:'POST',
   headers:{'Content-Type':'application/json'},body:JSON.stringify(body)});
  if(!r.ok){out.textContent='[HTTP '+r.status+'] '+await r.text();
   send.disabled=false;return;}
  const rd=r.body.getReader(),dec=new TextDecoder();let buf='';
  for(;;){const{done,value}=await rd.read();if(done)break;
   buf+=dec.decode(value,{stream:true});
   let i;while((i=buf.indexOf('\\n'))>=0){
    const line=buf.slice(0,i).trim();buf=buf.slice(i+1);
    if(!line.startsWith('data:'))continue;
    const payload=line.slice(5).trim();
    if(payload==='[DONE]')continue;
    try{const j=JSON.parse(payload);
     const c=j.choices&&j.choices[0];
     const piece=c&&(c.delta?(c.delta.content||''):(c.text||''));
     if(piece){acc+=piece;out.textContent=acc;
      log.scrollTop=log.scrollHeight;}
    }catch(e){}}}
 }catch(e){out.textContent='[error] '+e;}
 if(mode==='chat'&&acc)history.push({role:'assistant',content:acc});
 send.disabled=false;inp.focus();}
send.onclick=go;
inp.addEventListener('keydown',e=>{
 if(e.key==='Enter'&&!e.shiftKey){e.preventDefault();go();}});
</script></body></html>"""
